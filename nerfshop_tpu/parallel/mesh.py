"""Device-mesh scale-out (SURVEY §2.7 — new design scope, no reference
counterpart: the CUDA app is single-GPU).

* **Data-parallel training**: the ray batch shards across the ``data`` mesh
  axis; hash table + MLPs replicate (the whole model is ~50 MB — per
  SURVEY §2.7 replication is the right call on v5p); gradients ``psum`` over
  ICI inside ``shard_map``; every device applies the same optimizer update
  so states remain bitwise in sync.
* **Pixel-sharded rendering**: rays shard across devices; no collectives
  until the final gather of tiles.

Both paths are pure SPMD — they compile with any mesh size and run on a
virtual CPU mesh for testing.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerfshop_tpu.models.nerf_network import NerfNetwork
from nerfshop_tpu.train import nerf as nerf_train
from nerfshop_tpu.train import optim

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_parallel_train_step(
    model: NerfNetwork,
    spec: optim.OptimizerSpec,
    cfg: nerf_train.NerfTrainConfig,
    mesh: Mesh,
):
    """(state, occupancy, data, rng) → (state, aux); rays shard over the
    ``data`` axis, grads psum over ICI. All args/results replicated except
    the per-device RNG fold. ``cfg.n_rays_per_batch`` is the GLOBAL batch."""
    n_dev = mesh.shape[DATA_AXIS]
    if cfg.n_rays_per_batch % n_dev:
        raise ValueError(f"n_rays_per_batch {cfg.n_rays_per_batch} not divisible by mesh size {n_dev}")
    local_rays = cfg.n_rays_per_batch // n_dev
    grads_of = nerf_train.make_grad_fn(model, cfg, n_rays=local_rays)

    if cfg.use_error_map:
        # error-map variant: the map replicates; each shard samples pixels
        # from it and deposits its rays' losses locally; deposits psum over
        # ICI and the decay applies once — bitwise-identical map on every
        # device, same contract as the serial step_em
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        def sharded_em(state, occupancy, data, rng, error_map):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
            grads, aux = grads_of(state.params, occupancy, data, rng, error_map)
            dep = nerf_train.error_map_deposit(
                error_map.shape, aux.pop("img_idx"), aux.pop("pix"),
                aux.pop("per_ray_loss"), data.images.shape, data.sharpness,
            )
            dep = jax.lax.psum(dep, DATA_AXIS)
            new_em = error_map * cfg.error_map_decay + dep
            grads = jax.lax.pmean(grads, DATA_AXIS)
            aux = jax.tree.map(lambda x: jax.lax.pmean(x.astype(jnp.float32), DATA_AXIS), aux)
            new_state = optim.apply_gradients(state, grads, spec)
            return new_state, aux, new_em

        return sharded_em

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded(state, occupancy, data, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        grads, aux = grads_of(state.params, occupancy, data, rng)
        # per-ray integer aux (pixel picks) is device-local bookkeeping —
        # drop it before the float pmean (matches the serial step's contract)
        aux.pop("img_idx", None)
        aux.pop("pix", None)
        aux.pop("per_ray_loss", None)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        aux = jax.tree.map(lambda x: jax.lax.pmean(x.astype(jnp.float32), DATA_AXIS), aux)
        new_state = optim.apply_gradients(state, grads, spec)
        return new_state, aux

    return sharded


def make_sharded_render(
    model: NerfNetwork,
    mesh: Mesh,
    opts=None,
):
    """Pixel-sharded rendering (SURVEY §2.7b): rays shard over the ``data``
    axis, each device marches + evaluates its slice with the replicated
    model/grid, and the output tiles reassemble via the output sharding —
    no collective other than the implicit gather of the result.

    → fn(params, grid, origins [R,3], dirs [R,3], bg [4]) → (rgba [R,4],
    depth [R]); R must be divisible by the mesh size (pad upstream).
    """
    from nerfshop_tpu.render import renderer as renderer_lib

    opts = opts or renderer_lib.RenderOptions()
    n_dev = mesh.shape[DATA_AXIS]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    def sharded(params, grid, origins, dirs, bg):
        return renderer_lib._render_chunk(model, params, grid, origins, dirs, opts, bg)

    return jax.jit(sharded)


def render_frame_sharded(
    model: NerfNetwork,
    params,
    grid,
    mesh: Mesh,
    resolution: Tuple[int, int],
    xform,
    focal,
    principal=None,
    opts=None,
    bg=None,
):
    """Whole-frame pixel-sharded render (convenience driver over
    :func:`make_sharded_render`). → (rgba [H,W,4], depth [H,W])."""
    from nerfshop_tpu.ops import rays as rays_lib
    from nerfshop_tpu.render import renderer as renderer_lib

    W, H = resolution
    principal = jnp.asarray([0.5, 0.5]) if principal is None else principal
    bg = jnp.zeros(4) if bg is None else jnp.asarray(bg, jnp.float32)
    bundle = rays_lib.rays_for_image((W, H), xform, focal, principal)
    n = W * H
    n_dev = mesh.shape[DATA_AXIS]
    n_pad = (-n) % n_dev
    origins = jnp.concatenate([bundle.origins, jnp.zeros((n_pad, 3))])
    dirs = jnp.concatenate(
        [bundle.directions, jnp.ones((n_pad, 3)) * jnp.asarray([0.0, 0.0, 1.0])]
    )
    fn = make_sharded_render(model, mesh, opts)
    rgba, depth = fn(params, grid, origins, dirs, bg)
    return rgba[:n].reshape(H, W, 4), depth[:n].reshape(H, W)


def shard_rays(mesh: Mesh, *arrays):
    """Place ray-major arrays with their leading dim sharded over the mesh."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
