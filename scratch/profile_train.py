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
    # warm-up: compile + first exec outside the timed region
    for i in range(2):
        jax.block_until_ready(fn(i))
    outs = []
    t0 = time.perf_counter()
    for i in range(n):
        outs.append(fn(i + 2))
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)
    return dt


keys = [jax.random.fold_in(key, i) for i in range(64)]

# 1. full step — thread state (donated) through the chain
_state_box = [state]
def _full(i):
    s, aux = step(_state_box[0], grid, data, keys[i])
    _state_box[0] = s
    return aux["loss"]
t_full = timeit("full step", _full)
state = _state_box[0]

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

# --- encoding-level breakdown on a 2^18-point slab -------------------------
N = batch
enc = model.pos_encoding
enc_params = state.params["pos_encoding"]

@jax.jit
def enc_fwd(p, rng):
    x = jax.random.uniform(rng, (N, 3))
    return enc.apply(p, x).sum()

t_encf = timeit("enc fwd 2^18", lambda i: enc_fwd(enc_params, keys[i]))

@jax.jit
def enc_bwd(p, rng):
    x = jax.random.uniform(rng, (N, 3))
    return jax.grad(lambda pp: (enc.apply(pp, x) ** 2).sum())(p)["table"]

t_encb = timeit("enc fwd+bwd 2^18", lambda i: enc_bwd(enc_params, keys[i]).sum())

@jax.jit
def brick_build(p, rng):
    t = p["table"] + 1e-30 * jax.random.uniform(rng, ())
    return [b.sum() for b in enc._brick_tables(t)]

t_brk = timeit("brick table build", lambda i: brick_build(enc_params, keys[i])[0])

from nerfshop_tpu.ops import table_ops

lvl_sizes = enc.level_sizes
L = enc.n_levels
C = 1 << enc.n_input_dims
w = C * enc.n_features_per_level

@jax.jit
def seg_grad(rng):
    ks = jax.random.split(rng, 2)
    idx = jnp.stack([
        jax.random.randint(jax.random.fold_in(ks[0], l), (N,), 0, m) for l, m in enumerate(lvl_sizes)
    ])
    g = jax.random.uniform(ks[1], (L, N, w))
    outs = table_ops.segment_table_grad(idx, g, lvl_sizes)
    return sum(o.sum() for o in outs)

t_seg = timeit("segment_table_grad", lambda i: seg_grad(keys[i]))

@jax.jit
def hist_only(rng):
    acc = 0.0
    for l, m in enumerate(lvl_sizes):
        idx = jax.random.randint(jax.random.fold_in(rng, l), (N,), 0, m)
        acc = acc + table_ops.exact_histogram(idx, m).sum()
    return acc

t_hist = timeit("exact_histogram x16", lambda i: hist_only(keys[i]))

# MLP-only fwd+bwd on the same slab
@jax.jit
def mlp_bwd(p, rng):
    x = jax.random.uniform(rng, (N, enc.n_output_dims))
    d = jax.random.uniform(jax.random.fold_in(rng, 1), (N, 16))
    def f(pp):
        feats = model.density_mlp.apply(pp["density_mlp"], x)
        rgb_in = jnp.concatenate([feats, d], -1)
        return (model.rgb_mlp.apply(pp["rgb_mlp"], rgb_in) ** 2).sum()
    g = jax.grad(f)(p)
    # keep EVERY weight-grad leaf live so no backward matmul is DCE'd
    return sum(w.sum() for w in g["density_mlp"]["weights"]) + sum(
        w.sum() for w in g["rgb_mlp"]["weights"]
    )

t_mlp = timeit("mlps fwd+bwd 2^18", lambda i: mlp_bwd(state.params, keys[i]))
