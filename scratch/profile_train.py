"""Decompose the train-step time on chip: rays+march / fwd / fwd+bwd / adam.

Each timed program gets unique args per iteration (fresh rng or threaded
state) so the relay's execution memoization cannot serve cached results.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import coords, grid as grid_lib, march, rays as rays_lib
from nerfshop_tpu.train import nerf as nerf_train
from nerfshop_tpu.train import optim
from nerfshop_tpu.train.nerf import nerf_loss_fn
from nerfshop_tpu.train import losses as loss_lib

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
aabb = coords.BoundingBox.from_aabb_scale(1)
loss_fn = loss_lib.build_loss({"otype": "Huber"})

step = jax.jit(nerf_train.make_train_step(model, spec, cfg), donate_argnums=(0,))
grid_update = nerf_train.make_grid_update(model, cfg)
key = jax.random.PRNGKey(1)
for i in range(4):
    key, k1 = jax.random.split(key)
    state, aux = step(state, grid, data, k1)
grid = grid_update(grid, state.params, key, full_refresh=True)
jax.block_until_ready(aux["loss"])
print("occ frac", float(grid.occupancy.mean()))


def timeit(name, fn, n=10):
    outs = []
    t0 = time.perf_counter()
    for i in range(n):
        outs.append(fn(i))
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


keys = [jax.random.fold_in(key, i) for i in range(64)]

# 1. full step
t_full = timeit("full step", lambda i: step(state, grid, data, keys[i])[1]["loss"])

# 2. ray gen + march
@jax.jit
def rays_march(grid, data, rng):
    k_rays, k_march = jax.random.split(rng)
    N, H, W = data.images.shape[:3]
    resj = jnp.asarray([W, H], jnp.float32)
    img_idx, pix, targets = rays_lib.sample_training_pixels(k_rays, n_rays, data.images, None)
    b = rays_lib.rays_from_pixels(img_idx, pix, data.xforms, data.focals, data.principals, resj, data.distortions, None)
    s = march.march_rays_training(b.origins, b.directions, grid.occupancy, aabb.min, aabb.max,
                                  jnp.asarray(0.0), rng=k_march, t_start_min=0.05, k_samples=K)
    return s.n.sum(), b, s, targets

t_march = timeit("rays + march", lambda i: rays_march(grid, data, keys[i])[0])

# fixed sample batch for loss timing
_, b0, s0, tgt0 = rays_march(grid, data, keys[0])
bg0 = jnp.zeros((n_rays, 3))

# 3. loss forward only
@jax.jit
def loss_fwd(params, rng):
    bg = jax.random.uniform(rng, (n_rays, 3))
    l, _ = nerf_loss_fn(params, model, s0, b0.origins, b0.directions, tgt0, bg, aabb, loss_fn, 1e-4)
    return l

t_fwd = timeit("loss forward", lambda i: loss_fwd(state.params, keys[i]))

# 4. loss fwd + bwd
@jax.jit
def loss_bwd(params, rng):
    bg = jax.random.uniform(rng, (n_rays, 3))
    def lf(p):
        l, _ = nerf_loss_fn(p, model, s0, b0.origins, b0.directions, tgt0, bg, aabb, loss_fn, 1e-4)
        return l
    return jax.grad(lf)(params)

t_bwd = timeit("loss fwd+bwd", lambda i: loss_bwd(state.params, keys[i]))

# 5. adam apply
g0 = loss_bwd(state.params, keys[0])
@jax.jit
def adam(state, rng):
    g = jax.tree.map(lambda x: x + 1e-30 * jax.random.uniform(rng, ()).astype(x.dtype), g0)
    return optim.apply_gradients(state, g, spec)

t_adam = timeit("adam apply", lambda i: adam(state, keys[i]).step)
print("unaccounted (full - march - bwd - adam):", (t_full - t_march - t_bwd - t_adam) * 1e3, "ms")
