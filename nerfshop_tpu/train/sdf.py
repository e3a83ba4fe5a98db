"""SDF testbed: mesh → neural signed-distance field (reference:
src/testbed_sdf.cu — train_sdf 1222, generate_training_samples_sdf 1085,
render_sdf/SphereTracer 825, calculate_iou 1277).

TPU design notes:
* sample mix preserved: 4/8 exact-surface (target 0), 3/8 surface+logistic
  noise, 1/8 uniform in the (slightly inflated) aabb; ground-truth signed
  distances from the JAX BVH (geometry/bvh.py) with pseudo-normal signs —
  no OptiX raystab needed;
* sphere tracing as a fixed-iteration ``lax.while_loop`` over the whole
  pixel batch (alive-masked), shading from autodiff normals;
* IoU on uniform random points: sign agreement network vs BVH.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.models import encodings as enc
from nerfshop_tpu.models import mlp as mlp_lib
from nerfshop_tpu.train import losses as loss_lib
from nerfshop_tpu.train import optim


@dataclass
class SdfModel:
    encoding: enc.Encoding
    network: mlp_lib.MLP

    @staticmethod
    def from_config(config: dict, mesh=None) -> "SdfModel":
        enc_cfg = dict(config.get("encoding", {}))
        octree = None
        if enc_cfg.get("otype") == "Takikawa":
            # S3: octree over the scene mesh feeds the Takikawa encoding
            from nerfshop_tpu.geometry.triangle_octree import TriangleOctree

            if mesh is None:
                raise ValueError("Takikawa SDF config requires a mesh")
            depth = enc_cfg.get("starting_level", 4) + enc_cfg.get("n_levels", 10)
            octree = TriangleOctree.build(mesh[0], mesh[1], depth)
        e = enc.build_encoding(enc_cfg, 3, octree=octree)
        net = mlp_lib.build_network(dict(config.get("network", {})), e.n_output_dims, 1)
        return SdfModel(e, net)

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {"encoding": self.encoding.init(k1), "network": self.network.init(k2)}

    def apply(self, params, pos: jnp.ndarray) -> jnp.ndarray:
        """pos in [0,1]³ → signed distance [N]."""
        return self.network.apply(params["network"], self.encoding.apply(params["encoding"], pos))[..., 0]


@dataclass
class SdfTestbed:
    model: SdfModel
    spec: optim.OptimizerSpec
    state: optim.TrainState
    loss_fn: object
    bvh: Optional[object] = None
    tri_cdf: Optional[jnp.ndarray] = None
    tri_v: Optional[jnp.ndarray] = None  # [F, 3, 3] normalized to [0,1] box
    rng: jax.Array = None
    step: int = 0
    zero_offset: float = 0.0029296875  # m_sdf.zero_offset analog: small inflate
    surface_offset_scale: float = 1.0
    bounding_radius: float = math.sqrt(3.0) / 2
    #: shading knobs (reference: m_brdf / m_sun_dir / m_sdf.shadow_sharpness /
    #: m_sdf.analytic_normals / m_sdf.fd_normals_epsilon / m_floor_enable)
    brdf: object = None  # BrdfParams, set in create()
    sun_dir: tuple = (0.577, 0.577, 0.577)
    shadow_sharpness: float = 2048.0
    render_shadows: bool = True
    analytic_normals: bool = True
    fd_normals_epsilon: float = 1e-3
    floor_enable: bool = False
    _step_fn: object = None
    _trace_fn: object = None

    @staticmethod
    def create(config: dict, mesh, rng) -> "SdfTestbed":
        spec = optim.build_optimizer(dict(config.get("optimizer", {"otype": "Adam", "learning_rate": 1e-2})))
        k1, k2 = jax.random.split(rng)
        loss_fn = loss_lib.build_loss(dict(config.get("loss", {"otype": "Mape"})))
        needs_octree = dict(config.get("encoding", {})).get("otype") == "Takikawa"
        if needs_octree and mesh is None:
            raise ValueError("Takikawa SDF config requires a mesh")
        # build after normalization so the octree sees unit-cube coordinates
        model = None
        if not needs_octree:
            model = SdfModel.from_config(config)
        from nerfshop_tpu.ops.brdf import BrdfParams

        tb = SdfTestbed(model=model, spec=spec, state=None, loss_fn=loss_fn, rng=k2,
                        brdf=BrdfParams())
        if mesh is not None:
            tb.set_mesh(mesh)
        if needs_octree:
            tb.model = SdfModel.from_config(config, mesh=(tb._mesh_vertices, tb._mesh_faces))
        tb.state = optim.create_train_state(tb.model.init(k1), spec)
        return tb

    def set_mesh(self, mesh) -> None:
        """Normalize the mesh into the unit cube (reference load_mesh scales
        to [0,1] with margin) and build the BVH + area CDF."""
        from nerfshop_tpu.geometry import bvh as bvh_lib

        v = np.asarray(mesh.vertices, np.float32)
        lo, hi = v.min(0), v.max(0)
        scale = 0.9 / max(float((hi - lo).max()), 1e-9)
        v = (v - (lo + hi) / 2) * scale + 0.5
        self._mesh_vertices = v
        self._mesh_faces = np.asarray(mesh.faces, np.int32)
        self.bvh = bvh_lib.build_bvh(v, mesh.faces)
        tris = v[mesh.faces]
        area = 0.5 * np.linalg.norm(
            np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1
        )
        cdf = np.cumsum(area)
        self.tri_cdf = jnp.asarray((cdf / cdf[-1]).astype(np.float32))
        self.tri_v = jnp.asarray(tris)
        self._step_fn = None

    # ------------------------------------------------------------- training

    def _sample_batch(self, params_unused, rng, n: int):
        """→ (positions [n,3], target distances [n]) with the 4/3/1 mix."""
        base = n // 8
        n_exact, n_offset, n_uniform = 4 * base, 3 * base, n - 7 * base
        k1, k2, k3, k4 = jax.random.split(rng, 4)

        # surface samples via area-CDF + uniform barycentrics
        u = jax.random.uniform(k1, (n_exact + n_offset,))
        ti = jnp.searchsorted(self.tri_cdf, u)
        tri = self.tri_v[jnp.clip(ti, 0, self.tri_v.shape[0] - 1)]
        b = jax.random.uniform(k2, (n_exact + n_offset, 2))
        s = jnp.sqrt(b[:, :1])
        bary = jnp.concatenate([1 - s, s * (1 - b[:, 1:]), s * b[:, 1:]], -1)
        surf = jnp.einsum("nk,nkd->nd", bary, tri)

        # logistic perturbation of the offset group
        std = self.bounding_radius / 1024.0 * self.surface_offset_scale
        uu = jnp.clip(jax.random.uniform(k3, (n_offset, 3)), 1e-6, 1 - 1e-6)
        noise = std * jnp.log(uu / (1 - uu))  # logistic(0, std)
        offset_pts = surf[n_exact:] + noise

        uniform_pts = jax.random.uniform(k4, (n_uniform, 3), minval=-self.zero_offset, maxval=1 + self.zero_offset)

        pos = jnp.concatenate([surf[:n_exact], offset_pts, uniform_pts])
        from nerfshop_tpu.geometry import bvh as bvh_lib

        d_rest = bvh_lib.signed_distance(self.bvh, pos[n_exact:])
        target = jnp.concatenate([jnp.zeros(n_exact), d_rest])
        return pos, target

    def train(self, n_steps: int, batch_size: int = 1 << 16) -> float:
        assert self.bvh is not None, "load a mesh first"
        batch_size = min(batch_size, 1 << 16)
        if self._step_fn is None:
            model, spec, loss_fn = self.model, self.spec, self.loss_fn

            def step(state, pos, target):
                def loss_of(p):
                    pred = model.apply(p, pos)
                    return jnp.mean(loss_fn(target, pred))

                l, g = jax.value_and_grad(loss_of)(state.params)
                return optim.apply_gradients(state, g, spec), l

            self._step_fn = jax.jit(step, donate_argnums=(0,))
            self._sample_fn = jax.jit(lambda rng: self._sample_batch(None, rng, batch_size))

        loss = 0.0
        for _ in range(n_steps):
            self.rng, k = jax.random.split(self.rng)
            pos, target = self._sample_fn(k)
            self.state, loss = self._step_fn(self.state, pos, target)
            self.step += 1
        return float(loss)

    # ------------------------------------------------------------ rendering

    def _sphere_trace(self, params, origins, dirs, n_iters: int = 50, eps: float = 5e-4):
        """Batched sphere tracing in [0,1]³."""
        from nerfshop_tpu.ops.coords import BoundingBox

        aabb = BoundingBox.unit()
        tmin, tmax = aabb.ray_intersect(origins, dirs)
        tmin = jnp.maximum(tmin, 0.0)
        hit_box = tmin < tmax

        def cond(s):
            t, alive, _ = s
            return jnp.any(alive)

        def body(s):
            t, alive, it = s
            pos = origins + t[:, None] * dirs
            d = self.model.apply(params, jnp.clip(pos, 0, 1))
            t_new = t + d
            converged = jnp.abs(d) < eps
            out = t_new > tmax
            alive = alive & ~converged & ~out & (it < n_iters)
            t = jnp.where(alive, t_new, t)
            return (t, alive, it + 1)

        t, _, _ = jax.lax.while_loop(cond, body, (tmin, hit_box, jnp.int32(0)))
        pos = origins + t[:, None] * dirs
        d_final = self.model.apply(params, jnp.clip(pos, 0, 1))
        hit = hit_box & (jnp.abs(d_final) < eps * 20) & (t < tmax)
        return t, pos, hit

    def _normals(self, params, pos: jnp.ndarray) -> jnp.ndarray:
        """Surface normals: autodiff ∇sdf (reference 'analytic normals' —
        there via the network's input gradient) or central finite differences
        with ``fd_normals_epsilon``."""
        if self.analytic_normals:
            g = jax.grad(lambda p: jnp.sum(self.model.apply(params, p)))(jnp.clip(pos, 0, 1))
        else:
            e = self.fd_normals_epsilon
            g = jnp.stack(
                [
                    self.model.apply(params, jnp.clip(pos + jnp.asarray(off) * e, 0, 1))
                    - self.model.apply(params, jnp.clip(pos - jnp.asarray(off) * e, 0, 1))
                    for off in ((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0))
                ],
                -1,
            )
        return g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-9)

    def _shadow_trace(self, params, origins, dirs, k: float, n_iters: int = 40):
        """Sphere-trace toward the light accumulating soft visibility
        min(k·d/t) (the reference's shadow tracer with shadow_sharpness k,
        testbed_sdf.cu:758 / min_visibility in advance_pos_kernel_sdf)."""
        from nerfshop_tpu.ops.coords import BoundingBox

        aabb = BoundingBox.unit()
        _, tmax = aabb.ray_intersect(origins, dirs)

        def body(i, s):
            t, vis = s
            pos = origins + t[:, None] * dirs
            d = jnp.maximum(self.model.apply(params, jnp.clip(pos, 0, 1)), 0.0)
            vis = jnp.minimum(vis, k * d / jnp.maximum(t, 1e-4))
            t = jnp.minimum(t + jnp.maximum(d, 1e-3), tmax)
            return (t, vis)

        t0 = jnp.full(origins.shape[:1], 2e-3)
        _, vis = jax.lax.fori_loop(0, n_iters, body, (t0, jnp.ones(origins.shape[:1])))
        return jnp.clip(vis, 0.0, 1.0)

    def render(self, width: int, height: int, camera_matrix, focal, linear: bool = False) -> np.ndarray:
        """Sphere-traced Disney-BRDF shading with a sun light, soft sphere-
        traced shadows, optional floor plane (reference render_sdf,
        testbed_sdf.cu:825 + evaluate_shading:79)."""
        from nerfshop_tpu.ops import rays as rays_lib
        from nerfshop_tpu.ops import tonemap as tm
        from nerfshop_tpu.ops.brdf import disney_shade

        params = self.state.inference_params
        bundle = rays_lib.rays_for_image(
            (width, height), jnp.asarray(camera_matrix), jnp.asarray(focal), jnp.asarray([0.5, 0.5])
        )

        # shading knobs are compile-time constants of the trace program; re-jit
        # when any changes (cheap: tiny program, and knob flips are rare)
        knob_key = (
            tuple(vars(self.brdf).items()) if hasattr(self.brdf, "__dict__") else id(self.brdf),
            tuple(np.asarray(self.sun_dir, np.float32).tolist()),
            self.shadow_sharpness, self.render_shadows,
            self.analytic_normals, self.fd_normals_epsilon, self.floor_enable,
        )
        if getattr(self, "_trace_key", None) != knob_key:
            self._trace_fn = None
            self._trace_key = knob_key
        if self._trace_fn is None:
            brdf = self.brdf
            sun = np.asarray(self.sun_dir, np.float32)
            sun = jnp.asarray(sun / (np.linalg.norm(sun) + 1e-12))
            floor_y = 0.05

            def trace(params, o, d):
                t, pos, hit = self._sphere_trace(params, o, d)
                # analytic floor plane: closer plane hit wins / fills misses
                if self.floor_enable:
                    t_floor = (floor_y - o[:, 1]) / jnp.where(jnp.abs(d[:, 1]) < 1e-9, 1e-9, d[:, 1])
                    floor_hit = (t_floor > 0) & (jnp.where(hit, t, jnp.inf) > t_floor)
                    t = jnp.where(floor_hit, t_floor, t)
                    pos = jnp.where(floor_hit[:, None], o + t[:, None] * d, pos)
                    hit = hit | floor_hit
                else:
                    floor_hit = jnp.zeros_like(hit)
                n = self._normals(params, pos)
                n = jnp.where(floor_hit[:, None], jnp.asarray([0.0, 1.0, 0.0]), n)
                vis = (
                    self._shadow_trace(params, pos + n * 3e-3, jnp.broadcast_to(sun, pos.shape), self.shadow_sharpness)
                    if self.render_shadows
                    else jnp.ones(pos.shape[:1])
                )
                base = jnp.where(
                    floor_hit[:, None],
                    jnp.asarray([0.6, 0.6, 0.6]),
                    jnp.broadcast_to(jnp.asarray(brdf.basecolor), pos.shape),
                )
                rgb = disney_shade(
                    base, jnp.asarray(brdf.ambientcolor) * 0.25,
                    jnp.asarray([1.0, 1.0, 1.0]) * vis[:, None],
                    brdf, sun, -d, n,
                )
                rgb = jnp.where(hit[:, None], rgb, 0.0)
                return rgb, hit, t

            self._trace_fn = jax.jit(trace)

        rgb, hit, t = self._trace_fn(params, bundle.origins, bundle.directions)
        img = np.asarray(jnp.concatenate([rgb, hit[:, None].astype(jnp.float32)], -1)).reshape(height, width, 4)
        if not linear:
            img = np.concatenate(
                [np.asarray(tm.linear_to_srgb(jnp.asarray(img[..., :3]))), img[..., 3:]], -1
            )
        return img

    # -------------------------------------------------------------- metrics

    def calculate_iou(self, n_samples: int = 128**3) -> float:
        """Sign agreement on uniform random points (testbed_sdf.cu:1277)."""
        from nerfshop_tpu.geometry import bvh as bvh_lib

        n = min(n_samples, 1 << 18)
        self.rng, k = jax.random.split(self.rng)
        pts = jax.random.uniform(k, (n, 3))
        gt_inside = bvh_lib.signed_distance(self.bvh, pts) < 0
        pred_inside = self.model.apply(self.state.inference_params, pts) < 0
        inter = jnp.sum(gt_inside & pred_inside)
        union = jnp.sum(gt_inside | pred_inside)
        return float(inter) / max(float(union), 1.0)
