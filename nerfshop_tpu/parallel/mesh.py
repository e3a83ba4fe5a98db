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
        grads = jax.lax.pmean(grads, DATA_AXIS)
        aux = jax.tree.map(lambda x: jax.lax.pmean(x.astype(jnp.float32), DATA_AXIS), aux)
        new_state = optim.apply_gradients(state, grads, spec)
        return new_state, aux

    return sharded


def shard_rays(mesh: Mesh, *arrays):
    """Place ray-major arrays with their leading dim sharded over the mesh."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
