"""Split-batch grads: 2^18 samples as M sequential microbatches of 2^18/M
rays' worth, grads tree-summed in-program (EXACT same total gradient up to
fp reorder and pixel-draw rng).

Motivation: field-eval rate collapses with batch (probe_eval_overhead:
2x262k = 57 ms vs 1x524k = 132 ms) and the backward sort is O(N log^2 N) —
microbatching may ride the faster small-batch regime.  Bench-config rig
(ring cameras, K=64, 4096 rays), full-grad-consuming chains.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import grid as grid_lib, coords
from nerfshop_tpu.train import nerf as nerf_train, optim

import sys
sys.path.insert(0, "/root/repo")
from bench import ring_rig

K = 64
model = build_nerf_network(default_nerf_config(), aabb_scale=1)
spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
grid = grid_lib.OccupancyGrid.create(1)
rng0 = np.random.default_rng(0)
data = nerf_train.DeviceDataset(
    images=jnp.asarray(rng0.uniform(0, 1, (8, 256, 256, 4)).astype(np.float32)),
    xforms=jnp.asarray(ring_rig(8)),
    focals=jnp.full((8, 2), 180.0), principals=jnp.full((8, 2), 0.5),
    distortions=jnp.zeros((8, 4)),
)
R = (1 << 18) // K
cfg = nerf_train.NerfTrainConfig(
    n_rays_per_batch=R, k_samples=K, aabb_scale=1, n_cascades=1
)

step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
gupd = nerf_train.make_grid_update(model, cfg)
key = jax.random.PRNGKey(1)
for i in range(4):
    key, k1 = jax.random.split(key)
    state, aux = step(state, grid, data, k1)
grid = gupd(grid, state.params, key, full_refresh=True)
float(np.asarray(aux["loss"]))

SALT = int(time.time()) % 100000


def make_chain(M, iters):
    grads_m = nerf_train.make_grad_fn(model, cfg, n_rays=R // M)

    @jax.jit
    def run(params, rng):
        def f2(i, carry):
            acc, rng = carry
            rng2 = jax.random.fold_in(jax.random.fold_in(rng, i), SALT)
            tot = None
            loss = 0.0
            for m in range(M):
                g, aux = grads_m(params, grid, data, jax.random.fold_in(rng2, m))
                tot = g if tot is None else jax.tree_util.tree_map(jnp.add, tot, g)
                loss = loss + aux["loss"]
            s = jnp.zeros(())
            for leaf in jax.tree_util.tree_leaves(tot):
                s = s + jnp.sum(leaf) % 32.0
            return (acc + loss + s * 1e-9, rng)

        acc, _ = jax.lax.fori_loop(0, iters, f2, (jnp.zeros(()), rng))
        return acc

    return run


def bench(M, iters=8):
    c1, cK = make_chain(M, 1), make_chain(M, iters)
    float(np.asarray(c1(state.params, jax.random.PRNGKey(2 + SALT))))
    float(np.asarray(cK(state.params, jax.random.PRNGKey(3 + SALT))))
    t0 = time.perf_counter()
    float(np.asarray(c1(state.params, jax.random.PRNGKey(4 + SALT))))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(cK(state.params, jax.random.PRNGKey(5 + SALT))))
    tK = time.perf_counter() - t0
    dt = (tK - t1) / (iters - 1)
    print(f"full grads 2^18 as {M} x {R//M} rays x {K}: {dt*1e3:8.2f} ms", flush=True)


for M in (1, 2, 4):
    bench(M)
