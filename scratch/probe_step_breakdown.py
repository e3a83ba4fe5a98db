import time, jax, jax.numpy as jnp, numpy as np
from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import grid as grid_lib, march, coords, rays as rays_lib, composite as comp
from nerfshop_tpu.train import nerf as nerf_train, optim, losses as loss_lib

aabb_scale = 4
model = build_nerf_network(default_nerf_config(), aabb_scale=aabb_scale)
cfg = nerf_train.NerfTrainConfig.for_aabb_scale(aabb_scale, n_rays_per_batch=8192)
spec = optim.build_optimizer({"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15})
state = optim.create_train_state(model.init(jax.random.PRNGKey(0)), spec)
grid = grid_lib.OccupancyGrid.create(cfg.n_cascades)
# make ~5% of cells occupied so march produces full K batches
key = jax.random.PRNGKey(9)
occ = jax.random.uniform(key, grid.density.shape) < 0.05
grid = grid._replace(occupancy=occ, density=jnp.where(occ, 5.0, 0.0))
rng0 = np.random.default_rng(0)
data = nerf_train.DeviceDataset(
    images=jnp.asarray(rng0.uniform(0, 1, (8, 128, 128, 4)).astype(np.float32)),
    xforms=jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[:3][None], (8, 1, 1))),
    focals=jnp.full((8, 2), 128.0), principals=jnp.full((8, 2), 0.5),
    distortions=jnp.zeros((8, 4)),
)
aabb = coords.BoundingBox.from_aabb_scale(aabb_scale)
loss_fn = loss_lib.LOSSES[cfg.loss_type]

def chain_time(f, state0, n=10, label=""):
    key = jax.random.PRNGKey(1)
    s = state0
    for _ in range(2):
        key, k = jax.random.split(key)
        s, out = f(s, k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        key, k = jax.random.split(key)
        s, out = f(s, k)
    jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:8.1f} ms", flush=True)

R_ = cfg.n_rays_per_batch

@jax.jit
def just_march(carry, k):
    k1, k2 = jax.random.split(k)
    img_idx, pix, targets = rays_lib.sample_training_pixels(k1, R_, data.images, None)
    bundle = rays_lib.rays_from_pixels(img_idx, pix, data.xforms, data.focals, data.principals,
                                       jnp.asarray([128., 128.]), data.distortions, None)
    s = march.march_rays_training(bundle.origins, bundle.directions, grid.occupancy,
                                  aabb.min, aabb.max, jnp.asarray(cfg.cone_angle), rng=k2,
                                  t_start_min=cfg.near_distance, k_samples=cfg.k_samples)
    return carry + jnp.sum(s.t) * 1e-9, jnp.sum(s.n)
chain_time(just_march, jnp.zeros(()), label="march+raygen     ")

@jax.jit
def march_fwd_loss(carry, k):
    k1, k2, k3 = jax.random.split(k, 3)
    img_idx, pix, targets = rays_lib.sample_training_pixels(k1, R_, data.images, None)
    bundle = rays_lib.rays_from_pixels(img_idx, pix, data.xforms, data.focals, data.principals,
                                       jnp.asarray([128., 128.]), data.distortions, None)
    s = march.march_rays_training(bundle.origins, bundle.directions, grid.occupancy,
                                  aabb.min, aabb.max, jnp.asarray(cfg.cone_angle), rng=k2,
                                  t_start_min=cfg.near_distance, k_samples=cfg.k_samples)
    bg = jax.random.uniform(k3, (R_, 3))
    loss, aux = nerf_train.nerf_loss_fn(carry_params, model, s, bundle.origins, bundle.directions,
                                        targets, bg, aabb, loss_fn, cfg.min_transmittance)
    return carry, loss
carry_params = state.params
chain_time(lambda c, k: march_fwd_loss(c, k), jnp.zeros(()), label="march+fwd+loss   ")

step = jax.jit(nerf_train.make_train_step(model, spec, cfg))
def full_step(s, k):
    s2, aux = step(s, grid, data, k)
    return s2, aux["loss"]
chain_time(full_step, state, label="full train step  ")

# encoding-only fwd and fwd+bwd at 262144
enc = model.pos_encoding
N = R_ * cfg.k_samples
@jax.jit
def enc_fwd(x, k):
    x2 = jnp.clip(x + jax.random.uniform(k, x.shape) * 1e-6, 0, 1)
    return x2, jnp.sum(enc.apply(state.params["pos_encoding"], x2))
x0 = jax.random.uniform(jax.random.PRNGKey(5), (N, 3))
chain_time(lambda x, k: enc_fwd(x, k), x0, label="enc fwd 262k     ")

@jax.jit
def enc_bwd(x, k):
    x2 = jnp.clip(x + jax.random.uniform(k, x.shape) * 1e-6, 0, 1)
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, x2) ** 2))(state.params["pos_encoding"])
    return x2, jnp.sum(g["table"])
chain_time(lambda x, k: enc_bwd(x, k), x0, label="enc fwd+bwd 262k ")
