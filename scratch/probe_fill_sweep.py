"""Sweep (k_samples, n_rays, n_candidates) on the REAL train step and report
REAL samples/s (slab rate x fill) — the VERDICT r3 #2 headline. In-program
fori_loop chains, t(5)-t(1) differencing.

Usage: PYTHONPATH=/root/.axon_site:/root/repo JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
  python -u scratch/probe_fill_sweep.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import grid as grid_lib
from nerfshop_tpu.train import nerf as nerf_train
from nerfshop_tpu.train import optim

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
state0 = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
grid = grid_lib.OccupancyGrid.create(1)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import ring_rig

rng = np.random.default_rng(0)
n_views, res = 8, 256
data = nerf_train.DeviceDataset(
    images=jnp.asarray(rng.uniform(0, 1, (n_views, res, res, 4)).astype(np.float32)),
    xforms=jnp.asarray(ring_rig(n_views)),
    focals=jnp.full((n_views, 2), 180.0),
    principals=jnp.full((n_views, 2), 0.5),
    distortions=jnp.zeros((n_views, 4)),
)

# converge the grid once with the default config
cfg0 = nerf_train.NerfTrainConfig(n_rays_per_batch=8192, k_samples=32, aabb_scale=1, n_cascades=1)
step0 = jax.jit(nerf_train.make_train_step(model, spec, cfg0), donate_argnums=(0,))
gu = nerf_train.make_grid_update(model, cfg0)
st = state0
key = jax.random.PRNGKey(1)
for i in range(4):
    key, k1 = jax.random.split(key)
    st, aux = step0(st, grid, data, k1)
grid = gu(grid, st.params, key, full_refresh=True)
print("occ frac", float(np.asarray(grid.occupancy.mean())), flush=True)
state0 = st


def make_loop(cfg, S):
    step_fn = nerf_train.make_train_step(model, spec, cfg)

    @jax.jit
    def run(state, grid, data, key):
        def body(i, carry):
            st, loss, ms = carry
            st2, aux = step_fn(st, grid, data, jax.random.fold_in(key, i))
            return st2, aux["loss"], aux["measured_samples"]

        return jax.lax.fori_loop(0, S, body, (state, jnp.zeros(()), jnp.zeros((), jnp.int32)))

    return run


def bench(cfg):
    r1, r5 = make_loop(cfg, 1), make_loop(cfg, 5)
    st = jax.tree.map(lambda a: a.copy(), state0)
    key2 = jax.random.PRNGKey(9)
    st, l, ms = r5(st, grid, data, jax.random.fold_in(key2, 0))
    float(np.asarray(l))
    st, l, ms = r1(st, grid, data, jax.random.fold_in(key2, 1))
    float(np.asarray(l))
    t0 = time.perf_counter()
    st, l, ms = r1(st, grid, data, jax.random.fold_in(key2, 2))
    float(np.asarray(l))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    st, l, ms = r5(st, grid, data, jax.random.fold_in(key2, 3))
    l_host = float(np.asarray(l))
    ms_host = int(np.asarray(ms))
    t5 = time.perf_counter() - t0
    dt = (t5 - t1) / 4.0
    slab = cfg.n_rays_per_batch * cfg.k_samples
    fill = ms_host / slab
    return dt, fill, slab, l_host


for K, R, C in (
    (32, 8192, 1024),   # current bench point
    (32, 8192, 384),
    (64, 4096, 1024),   # fewer rays: march cost ∝ R
    (64, 4096, 384),
    (128, 2048, 1024),
    (64, 8192, 1024),   # slab 2^19
    (32, 16384, 1024),  # slab 2^19 at K=32
):
    cfg = nerf_train.NerfTrainConfig(
        n_rays_per_batch=R, k_samples=K, aabb_scale=1, n_cascades=1, n_candidates=C
    )
    try:
        dt, fill, slab, loss = bench(cfg)
        print(
            f"K={K:3d} R={R:6d} C={C:5d}: {dt*1e3:7.1f} ms/step  fill={fill:.3f}  "
            f"real={slab*fill/dt/1e6:6.2f} M/s  slab={slab*1.0/dt/1e6:6.2f} M/s  loss={loss:.4f}",
            flush=True,
        )
    except Exception as e:
        print(f"K={K} R={R} C={C}: FAILED {type(e).__name__}: {e}", flush=True)
