"""NeRF training: the TPU-native analog of train_nerf_step.

Reference pipeline (src/testbed_nerf.cu:4211-4440 ``train_nerf_step``,
3697-3916 ``train_nerf``, 1685-1985 ``compute_loss_kernel_train_nerf``):
per-step sample generation → no-grad inference → hand-derived loss/grad
kernel → compaction → fused fwd+bwd → Adam. Here the whole step is ONE
jitted function: sampling (non-differentiated), network forward on a fixed
[R·K] slab, differentiable composite + photometric loss, ``jax.grad``
through network+composite (reproducing the analytic dL/d(rgbσ)), optax
update. No double forward, no host syncs, shardable over a device mesh
(rays = batch dim).

Loss semantics preserved: per-ray random background color, straight-alpha
target compositing over that background, sRGB-space targets for LDR data
(linear_colors=false, testbed.h:582), Huber/5 default, mean over rays.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.common import (
    DEFAULT_BATCH_SIZE,
    GRID_RESOLUTION,
    MIN_TRANSMITTANCE_EVAL,
)
from nerfshop_tpu.models.nerf_network import NerfNetwork
from nerfshop_tpu.ops import composite as comp
from nerfshop_tpu.ops import coords, grid as grid_lib, march, rays as rays_lib
from nerfshop_tpu.train import losses as loss_lib
from nerfshop_tpu.train import optim


class DeviceDataset(NamedTuple):
    """Training data resident on device (or sharded across the mesh)."""

    images: jnp.ndarray  # [N, H, W, 4]
    xforms: jnp.ndarray  # [N, 3, 4]
    focals: jnp.ndarray  # [N, 2]
    principals: jnp.ndarray  # [N, 2]
    distortions: jnp.ndarray  # [N, 4]
    #: per-image sharpness weight (mean-normalized variance of Laplacian;
    #: weights the error-map deposit like the reference's ×sharpness, T7)
    sharpness: Optional[jnp.ndarray] = None  # [N]
    #: end-of-exposure poses + shutter vector for rolling-shutter /
    #: motion-blur training (reference testbed_nerf.cu:1124)
    xforms_end: Optional[jnp.ndarray] = None  # [N, 3, 4]
    rolling_shutter: Optional[jnp.ndarray] = None  # [4]
    #: per-image light directions (reference nerf_loader.h:35/has_light_dirs
    #: ⇒ 3 extra dims appended to the dir-encoding input)
    light_dirs: Optional[jnp.ndarray] = None  # [N, 3]

    @staticmethod
    def from_dataset(ds) -> "DeviceDataset":
        sharp = None
        if getattr(ds, "sharpness", None) is not None:
            s = np.asarray(ds.sharpness, np.float32)
            sharp = jnp.asarray(s / max(float(s.mean()), 1e-9))
        xf_end = getattr(ds, "xforms_end", None)
        rs = np.asarray(getattr(ds, "rolling_shutter", np.zeros(4)), np.float32)
        use_shutter = xf_end is not None and (rs != 0).any()
        ld = getattr(ds, "light_dirs", None) if getattr(ds, "has_light_dirs", False) else None
        return DeviceDataset(
            images=jnp.asarray(ds.images),
            xforms=jnp.asarray(ds.xforms),
            focals=jnp.asarray(ds.focal_matrix()),
            principals=jnp.asarray(ds.principal_matrix()),
            distortions=jnp.asarray(ds.distortion_matrix()),
            sharpness=sharp,
            xforms_end=jnp.asarray(xf_end) if use_shutter else None,
            rolling_shutter=jnp.asarray(rs) if use_shutter else None,
            light_dirs=jnp.asarray(np.asarray(ld, np.float32)) if ld is not None else None,
        )


@dataclass(frozen=True)
class NerfTrainConfig:
    n_rays_per_batch: int = 1 << 14
    k_samples: int = 32
    #: march candidate budget per ray (reference: 1024 steps/ray,
    #: common_nerf.h:25). The march's grid-probe gathers scale with it, so
    #: small scenes (aabb_scale 1, single cascade) can train with far fewer.
    n_candidates: int = 1024
    cone_angle: float = 0.0  # reference: 0 for aabb_scale 1, 1/256 otherwise
    near_distance: float = 0.2  # testbed.h:603
    min_transmittance: float = MIN_TRANSMITTANCE_EVAL
    random_bg: bool = True
    aabb_scale: int = 1
    n_cascades: int = 1
    loss_type: str = "Huber"
    #: per-image pose/exposure refinement (reference T6: hand-derived camera
    #: gradient kernel + host Adam, testbed_nerf.cu:2341/3833 — here the pose
    #: deltas are just parameters and autodiff does the rest)
    optimize_extrinsics: bool = False
    optimize_exposure: bool = False
    #: 2D error-map importance sampling (reference T7, testbed_nerf.cu:2620)
    use_error_map: bool = False
    error_map_resolution: int = 32
    error_map_decay: float = 0.97
    #: trainable lat-long environment map as the background (reference T8:
    #: TrainableBuffer<4,2> + envmap composite, testbed.cu:2427-2442); the
    #: envmap lives at params["envmap"] (see ops/envmap.py)
    train_envmap: bool = False

    @staticmethod
    def for_aabb_scale(aabb_scale: int, **kw) -> "NerfTrainConfig":
        import math

        n_casc = max(1, int(math.ceil(math.log2(max(aabb_scale, 1)))) + 1)
        cone = 0.0 if aabb_scale <= 1 else 1.0 / 256.0
        return NerfTrainConfig(aabb_scale=aabb_scale, n_cascades=n_casc, cone_angle=cone, **kw)


def nerf_loss_fn(
    params,
    model: NerfNetwork,
    samples: march.SampleBatch,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    targets: jnp.ndarray,  # [R, 4] straight-alpha, training color space
    bg_color: jnp.ndarray,  # [R, 3]
    aabb: coords.BoundingBox,
    loss_fn: Callable,
    min_transmittance: float,
    near_distance: float = 0.0,
    mean_grid_density: Optional[jnp.ndarray] = None,
    extra: Optional[jnp.ndarray] = None,  # [R, E] per-ray extra dims
    precomputed=None,  # (pre_pos, d_enc) from model.precompute_raw_inputs
) -> Tuple[jnp.ndarray, dict]:
    from nerfshop_tpu.common import NERF_MIN_OPTICAL_THICKNESS
    from nerfshop_tpu.models import nerf_network as nn_lib

    R, K = samples.t.shape
    if precomputed is not None:
        # fast path: encode indices/fracs + SH dir output were computed
        # OUTSIDE the grad closure (they don't depend on trainable params
        # when camera opt is off) — keeps them out of the VJP trace,
        # ~13.5 ms/step at 2^18 on v5e (probe_bwd_stages manual-vs-model)
        raw_rgb, raw_sigma = model.raw_forward_pre(params, *precomputed)
    else:
        pos_w, dir_w = march.samples_to_network_inputs(samples, origins, directions, aabb)
        extra_flat = None
        if extra is not None:
            extra_flat = jnp.broadcast_to(extra[:, None, :], (R, K, extra.shape[-1])).reshape(
                R * K, extra.shape[-1]
            )
        raw_rgb, raw_sigma = model.raw_forward(
            params, pos_w.reshape(R * K, 3), dir_w.reshape(R * K, 3), extra=extra_flat
        )
    rgb = nn_lib.rgb_activation_fn(raw_rgb, model.rgb_activation).reshape(R, K, 3)
    sigma = nn_lib.density_activation_fn(raw_sigma, model.density_activation).reshape(R, K)
    raw_sigma = raw_sigma.reshape(R, K)

    res = comp.composite(sigma, rgb, samples.dt, samples.t, samples.valid, min_transmittance)
    pred = comp.composite_with_background(res, bg_color)
    target_rgb = targets[:, :3] * targets[:, 3:4] + bg_color * (1.0 - targets[:, 3:4])

    per_ray = jnp.mean(loss_fn(target_rgb, pred), axis=-1)
    loss = jnp.mean(per_ray)

    # --- output regularizers + near-distance penalty (reference:
    # compute_loss_kernel_train_nerf, testbed_nerf.cu:1891-1937) ---
    valid_f = samples.valid.astype(jnp.float32)
    # HDR color: one-sided L2 on too-large raw outputs (grad = 1e-4·raw⁺)
    if model.rgb_activation == "exponential":
        loss = loss + 1e-4 * 0.5 * jnp.sum(
            jnp.square(jax.nn.relu(raw_rgb.reshape(R, K, 3))) * valid_f[..., None]
        ) / R
    # early-training density floor: while the grid is still empty, push
    # negative raw densities up (grad = −1e-4 where raw < 0)
    if mean_grid_density is not None:
        # reference gate compares mean OPTICAL THICKNESS (σ·Δmin) vs 0.01
        from nerfshop_tpu.common import MIN_CONE_STEPSIZE

        l1_on = (
            mean_grid_density * MIN_CONE_STEPSIZE < NERF_MIN_OPTICAL_THICKNESS
        ).astype(jnp.float32)
        loss = loss + l1_on * 1e-4 * jnp.sum(jax.nn.relu(-raw_sigma) * valid_f) / R
    # near-distance suppression: samples closer than near_distance along the
    # ray get pushed transparent (grad = +1e-4 on raw σ > −10)
    if near_distance > 0:
        near_mask = (samples.t < near_distance) & samples.valid & (raw_sigma > -10.0)
        loss = loss + 1e-4 * jnp.sum(jnp.where(near_mask, raw_sigma, 0.0)) / R

    aux = {
        "loss": loss,
        "per_ray_loss": jax.lax.stop_gradient(per_ray),
        "measured_samples": jnp.sum(samples.n),
        "mean_opacity": jnp.mean(res.opacity),
    }
    return loss, aux


def create_camera_params(n_images: int, distortion_map: bool = False, dmap_resolution: int = 32) -> dict:
    """Learnable per-image pose/exposure refinements (reference T6), plus an
    optional shared screen-space distortion grid (TrainableBuffer<2,2>,
    src/testbed.cu:2407-2425)."""
    p = {
        "rot": jnp.zeros((n_images, 3), jnp.float32),
        "trans": jnp.zeros((n_images, 3), jnp.float32),
        "log_exposure": jnp.zeros((n_images,), jnp.float32),
    }
    if distortion_map:
        p["distortion_map"] = jnp.zeros((dmap_resolution, dmap_resolution, 2), jnp.float32)
    return p


def create_error_map(n_images: int, resolution: int = 32) -> jnp.ndarray:
    return jnp.ones((n_images, resolution, resolution), jnp.float32)


def make_grad_fn(model: NerfNetwork, cfg: NerfTrainConfig, n_rays: Optional[int] = None):
    """Returns (params, grid, data, rng[, error_map]) → (grads, aux): the
    sampling + forward + loss + backward slice of one step, without the
    optimizer update — the unit that parallel layers wrap with a psum.

    With cfg.optimize_extrinsics, ``params['camera']`` pose deltas receive
    gradients through the differentiable ray construction (autodiff replaces
    the reference's hand-derived camera-gradient kernel, T6)."""
    loss_fn = loss_lib.LOSSES[cfg.loss_type]
    aabb = coords.BoundingBox.from_aabb_scale(cfg.aabb_scale)
    n_rays = n_rays or cfg.n_rays_per_batch

    def grads_of(params, grid: grid_lib.OccupancyGrid, data: DeviceDataset, rng: jax.Array, error_map=None):
        k_rays, k_march, k_bg, k_shutter = jax.random.split(rng, 4)
        N, H, W = data.images.shape[:3]
        res = jnp.asarray([W, H], jnp.float32)
        img_idx, pix, targets = rays_lib.sample_training_pixels(
            k_rays, n_rays, data.images, error_map if cfg.use_error_map else None
        )
        cam0 = params.get("camera") if cfg.optimize_extrinsics else None
        shutter = dict(
            xforms_end=data.xforms_end, rolling_shutter=data.rolling_shutter,
            rng=k_shutter,
        ) if data.xforms_end is not None else {}

        # rays for MARCHING: current pose, gradients stopped (sample t's are
        # treated as fixed given the ray — same as the reference)
        bundle0 = rays_lib.rays_from_pixels(
            img_idx, pix, data.xforms, data.focals, data.principals, res,
            data.distortions, jax.lax.stop_gradient(cam0) if cam0 else None,
            **shutter,
        )
        # march from the render near plane (0.05); the near-distance PENALTY
        # (not exclusion) handles [0.05, cfg.near_distance) — reference
        # samples there too and pushes density down (testbed_nerf.cu:1937)
        samples = march.march_rays_training(
            bundle0.origins, bundle0.directions, grid.occupancy,
            aabb.min, aabb.max, jnp.asarray(cfg.cone_angle),
            rng=k_march, t_start_min=min(0.05, cfg.near_distance),
            k_samples=cfg.k_samples, n_candidates=cfg.n_candidates,
        )
        bg0 = (
            jax.random.uniform(k_bg, (n_rays, 3))
            if cfg.random_bg
            else jnp.zeros((n_rays, 3))
        )

        # precompute param-independent forward inputs (encode fracs + SH)
        # outside the grad closure — only valid when rays are fixed wrt
        # params (no camera opt)
        pre = None
        if not cfg.optimize_extrinsics:
            R_, K_ = samples.t.shape
            pos_w0, dir_w0 = march.samples_to_network_inputs(
                samples, bundle0.origins, bundle0.directions, aabb
            )
            extra0 = None
            if data.light_dirs is not None and model.n_extra_dims:
                e = coords.warp_direction(data.light_dirs[img_idx])
                extra0 = jnp.broadcast_to(
                    e[:, None, :], (R_, K_, e.shape[-1])
                ).reshape(R_ * K_, e.shape[-1])
            pre = model.precompute_raw_inputs(
                params, pos_w0.reshape(R_ * K_, 3), dir_w0.reshape(R_ * K_, 3),
                extra=extra0,
            )
            if model.use_dir and pre[1] is None:
                pre = None  # dir encoding has trainable params: no fast path

        def loss_of(p):
            cam = p.get("camera") if cfg.optimize_extrinsics else None
            if cam is not None:
                bundle = rays_lib.rays_from_pixels(
                    img_idx, pix, data.xforms, data.focals, data.principals,
                    res, data.distortions, cam, **shutter,
                )
            else:
                bundle = bundle0
            if cfg.train_envmap and "envmap" in p:
                # envmap background: rays exiting the scene composite the
                # trainable lat-long map; autodiff replaces the reference's
                # gradient-deposit kernel (testbed_nerf.cu:1961-1984)
                from nerfshop_tpu.ops import envmap as envmap_lib

                bg = envmap_lib.sample_envmap(p["envmap"], bundle.directions)[:, :3]
            else:
                bg = bg0
            tgt = targets
            if cfg.optimize_exposure and "camera" in p:
                scale = jnp.exp(p["camera"]["log_exposure"][img_idx])[:, None]
                tgt = jnp.concatenate([targets[:, :3] * scale, targets[:, 3:]], -1)
            extra = None
            if data.light_dirs is not None and model.n_extra_dims:
                # warped per-image light dir appended to the dir encoding
                # input (reference: NerfCoordinate extra dims)
                extra = coords.warp_direction(data.light_dirs[img_idx])
            return nerf_loss_fn(
                p, model, samples, bundle.origins, bundle.directions,
                tgt, bg, aabb, loss_fn, cfg.min_transmittance,
                near_distance=cfg.near_distance,
                mean_grid_density=grid.mean_density,
                extra=extra,
                precomputed=pre,
            )

        (_, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        aux["img_idx"] = img_idx
        aux["pix"] = pix
        # fraction of rays that filled their K budget — drives the adaptive
        # rays/batch bucket (reference: Counters::update_after_training,
        # testbed_nerf.cu:3668: rays scaled until samples/ray fit)
        aux["sample_overflow_frac"] = jnp.mean((samples.n >= cfg.k_samples).astype(jnp.float32))
        return grads, aux

    return grads_of


def error_map_deposit(error_map_shape, img_idx, pix, per_ray_loss, images_shape, sharpness: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pure deposit term (no decay) — split out so the data-parallel step can
    psum per-shard deposits before applying the shared decay once."""
    N, H, W = images_shape[:3]
    eh, ew = error_map_shape[1:]
    ex = jnp.clip((pix[:, 0] / W * ew).astype(jnp.int32), 0, ew - 1)
    ey = jnp.clip((pix[:, 1] / H * eh).astype(jnp.int32), 0, eh - 1)
    if sharpness is not None:
        per_ray_loss = per_ray_loss * sharpness[img_idx]
    return jnp.zeros(error_map_shape, jnp.float32).at[img_idx, ey, ex].add(per_ray_loss)


def update_error_map(error_map: jnp.ndarray, img_idx, pix, per_ray_loss, images_shape, decay: float = 0.97, sharpness: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Deposit per-ray loss into the per-image error maps (reference:
    error-map splat in compute_loss + CDF rebuild, testbed_nerf.cu:2620),
    optionally weighted by per-image sharpness (×sharpness in the deposit)."""
    return error_map * decay + error_map_deposit(
        error_map.shape, img_idx, pix, per_ray_loss, images_shape, sharpness
    )


def make_train_step(
    model: NerfNetwork,
    spec: optim.OptimizerSpec,
    cfg: NerfTrainConfig,
):
    """Returns jittable (state, grid, data, rng) → (state, aux) — or, with
    cfg.use_error_map, (state, grid, data, rng, error_map) →
    (state, aux, error_map)."""
    grads_of = make_grad_fn(model, cfg)

    if cfg.use_error_map:

        def step_em(state: optim.TrainState, grid: grid_lib.OccupancyGrid, data: DeviceDataset, rng: jax.Array, error_map: jnp.ndarray):
            grads, aux = grads_of(state.params, grid, data, rng, error_map)
            new_state = optim.apply_gradients(state, grads, spec)
            new_em = update_error_map(
                error_map, aux.pop("img_idx"), aux.pop("pix"), aux["per_ray_loss"],
                data.images.shape, cfg.error_map_decay, sharpness=data.sharpness,
            )
            return new_state, aux, new_em

        return step_em

    def step(state: optim.TrainState, grid: grid_lib.OccupancyGrid, data: DeviceDataset, rng: jax.Array):
        grads, aux = grads_of(state.params, grid, data, rng)
        aux.pop("img_idx", None)
        aux.pop("pix", None)
        new_state = optim.apply_gradients(state, grads, spec)
        return new_state, aux

    return step


def make_train_loop(
    model: NerfNetwork,
    spec: optim.OptimizerSpec,
    cfg: NerfTrainConfig,
    n_steps: int,
):
    """``n_steps`` train steps inside ONE jitted program (lax.scan).

    The reference runs 16 steps per frame (src/testbed.cu:1749); here a
    whole 16-step group is one device program — per-step host dispatch
    (tens of ms through a serving tunnel, and host Python on a 1-core box)
    disappears from the training loop. Per-step rng = fold_in(rng, i).

    Returns (state, grid, data, rng[, error_map]) →
    (state, ys[, error_map]) where ``ys`` stacks per-step scalars
    (loss, measured_samples, sample_overflow_frac, mean_opacity) [n_steps].
    """
    step = make_train_step(model, spec, cfg)

    def _ys(aux):
        return {
            "loss": aux["loss"],
            "measured_samples": aux["measured_samples"],
            "sample_overflow_frac": aux["sample_overflow_frac"],
            "mean_opacity": aux["mean_opacity"],
        }

    if cfg.use_error_map:

        def loop_em(state, grid, data, rng, error_map):
            def body(carry, i):
                st, em = carry
                st, aux, em = step(st, grid, data, jax.random.fold_in(rng, i), em)
                return (st, em), _ys(aux)

            (state, error_map), ys = jax.lax.scan(
                body, (state, error_map), jnp.arange(n_steps)
            )
            return state, ys, error_map

        return loop_em

    def loop(state, grid, data, rng):
        def body(st, i):
            st, aux = step(st, grid, data, jax.random.fold_in(rng, i))
            return st, _ys(aux)

        state, ys = jax.lax.scan(body, state, jnp.arange(n_steps))
        return state, ys

    return loop


def make_density_fn(model: NerfNetwork, params, aabb: coords.BoundingBox, operators: tuple = ()):
    """WORLD positions [N,3] → activated density (for the occupancy grid).

    With operators, positions are warped through the edit stack and vacated
    source cells read zero density — the reference's
    update_density_grid_nerf_operator path (testbed_nerf.cu:3533-3640)."""

    def fn(pos_world):
        kill = None
        if operators:
            from nerfshop_tpu.editing import operators as op_lib

            pos_world, kill = op_lib.map_positions_through_stack(list(operators), pos_world)
        pos_w = jnp.clip(coords.warp_position(pos_world, aabb), 0.0, 1.0)
        sigma = model.density(params, pos_w)
        if kill is not None:
            # −1 sentinel: vacated cells HARD-clear in the grid update
            # instead of EMA-lingering for ~45 refreshes (the reference's
            # clear_empty_space kernel is a commented-out no-op and its
            # vacated cells stay occupied, testbed_nerf.cu:2767 — ours
            # actually empties, so post-edit renders and distilled students
            # never march the vacated source)
            sigma = jnp.where(kill, -1.0, sigma)
        return sigma

    return fn


def make_grid_update(
    model: NerfNetwork,
    cfg: NerfTrainConfig,
    n_samples_per_cascade: int = GRID_RESOLUTION**3 // 4,
    operators: tuple = (),
    trained_mask=None,
):
    """jittable (grid, params, rng, full_refresh[static]) → grid.
    Mirrors training_prep_nerf (testbed_nerf.cu:4460): density refresh + EMA
    + bitfield rebuild every 16 steps; full refresh during warm-up.
    ``trained_mask`` [C,R,R,R] bool (grid_lib.mark_untrained_cells): cells
    outside every training camera's frustum never become occupied
    (mark_untrained_density_grid, testbed_nerf.cu:353)."""
    aabb = coords.BoundingBox.from_aabb_scale(cfg.aabb_scale)
    operators = tuple(operators)

    @partial(jax.jit, static_argnames=("full_refresh", "has_mask"), donate_argnums=(0,))
    def update_inner(grid: grid_lib.OccupancyGrid, params, rng, ops, mask, full_refresh: bool, has_mask: bool):
        fn = make_density_fn(model, params, aabb, ops)
        grid = grid_lib.update_density_grid(
            grid, fn, rng, cfg.n_cascades, n_samples_per_cascade, full_refresh
        )
        if has_mask:
            # −1 density like the reference (testbed_nerf.cu:353): occupancy
            # then derives purely from density, so snapshots round-trip
            grid = grid._replace(density=jnp.where(mask, grid.density, -1.0))
        return grid_lib.update_bitfield(grid)

    dummy = jnp.zeros((), jnp.bool_)

    def update(grid, params, rng, full_refresh: bool):
        # operators/mask enter as TRACED arguments — closed-over device
        # arrays would be baked into the program as constant literals (a
        # 128 MB tet LUT blows both compile-request size and HBM globals)
        return update_inner(
            grid, params, rng, operators,
            trained_mask if trained_mask is not None else dummy,
            full_refresh, trained_mask is not None,
        )

    return update
