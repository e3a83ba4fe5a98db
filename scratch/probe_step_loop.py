"""Time the FULL train step inside an in-program lax.fori_loop.

Separates true device time from per-dispatch tunnel overhead: the loop body
is one complete train step (sampling + march + fwd + bwd + adam), the state
is the carry, and rng folds in the loop index. Reported per-step ms =
(t(S_hi steps) - t(S_lo steps)) / (S_hi - S_lo) — dispatch, transfer, and
any relay artifacts cancel.
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
state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
grid = grid_lib.OccupancyGrid.create(1)

batch = 1 << 18
K = 32
n_rays = batch // K
cfg = nerf_train.NerfTrainConfig(n_rays_per_batch=n_rays, k_samples=K, aabb_scale=1, n_cascades=1)
rng = np.random.default_rng(0)
n_views, res = 8, 256
data = nerf_train.DeviceDataset(
    images=jnp.asarray(rng.uniform(0, 1, (n_views, res, res, 4)).astype(np.float32)),
    xforms=jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[:3][None], (n_views, 1, 1))),
    focals=jnp.full((n_views, 2), 180.0),
    principals=jnp.full((n_views, 2), 0.5),
    distortions=jnp.zeros((n_views, 4)),
)

step_fn = nerf_train.make_train_step(model, spec, cfg)
grid_update = nerf_train.make_grid_update(model, cfg)

# settle grid like profile_train
single = jax.jit(step_fn, donate_argnums=(0,))
key = jax.random.PRNGKey(1)
for i in range(4):
    key, k1 = jax.random.split(key)
    state, aux = single(state, grid, data, k1)
grid = grid_update(grid, state.params, key, full_refresh=True)
print("occ frac", float(np.asarray(grid.occupancy.mean())), flush=True)


def make_loop(S):
    @jax.jit
    def run(state, grid, data, key):
        def body(i, carry):
            st, loss = carry
            st2, aux = step_fn(st, grid, data, jax.random.fold_in(key, i))
            return st2, aux["loss"]

        st, loss = jax.lax.fori_loop(0, S, body, (state, jnp.zeros(())))
        return st, loss

    return run


for S_lo, S_hi in [(1, 9)]:
    f_lo, f_hi = make_loop(S_lo), make_loop(S_hi)
    k = jax.random.PRNGKey(2)
    # warm both (compile)
    _, l = f_lo(state, grid, data, jax.random.fold_in(k, 0))
    float(np.asarray(l))
    _, l = f_hi(state, grid, data, jax.random.fold_in(k, 1))
    float(np.asarray(l))
    t0 = time.perf_counter()
    _, l = f_lo(state, grid, data, jax.random.fold_in(k, 2))
    float(np.asarray(l))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    st, l = f_hi(state, grid, data, jax.random.fold_in(k, 3))
    float(np.asarray(l))
    t_hi = time.perf_counter() - t0
    per = (t_hi - t_lo) / (S_hi - S_lo)
    print(
        f"in-program step: {per*1e3:.2f} ms/step  ({batch/per/1e6:.2f} M samples/s, "
        f"{1/per:.2f} steps/s)  [t({S_lo})={t_lo*1e3:.1f} ms t({S_hi})={t_hi*1e3:.1f} ms]",
        flush=True,
    )
