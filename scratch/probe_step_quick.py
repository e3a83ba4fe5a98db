"""Quick full-train-step timing (XLA pipeline only): in-program fori_loop
chain, t(9)−t(1) differencing. For A/B-ing encode variants."""
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


r1, r9 = make_loop(1), make_loop(9)
key2 = jax.random.fold_in(key, 7)
state, l = r9(state, grid, data, jax.random.fold_in(key2, 0))
float(np.asarray(l))
state, l = r1(state, grid, data, jax.random.fold_in(key2, 1))
float(np.asarray(l))
t0 = time.perf_counter()
state, l = r1(state, grid, data, jax.random.fold_in(key2, 2))
float(np.asarray(l))
t1 = time.perf_counter() - t0
t0 = time.perf_counter()
state, l = r9(state, grid, data, jax.random.fold_in(key2, 3))
float(np.asarray(l))
t9 = time.perf_counter() - t0
dt = (t9 - t1) / 8.0
print(
    f"step: {dt*1e3:7.2f} ms  ({batch/dt/1e6:.2f} M slab samples/s, "
    f"{1/dt:.2f} steps/s)  [t(1)={t1*1e3:.1f} t(9)={t9*1e3:.1f}]",
    flush=True,
)
