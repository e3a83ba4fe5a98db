import time, jax, jax.numpy as jnp, numpy as np
from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import march, grid as grid_lib, coords
from nerfshop_tpu.ops import composite as comp

def bench(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
params = model.init(jax.random.PRNGKey(0))
N = 1 << 18
pos = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
dirs = jax.random.uniform(jax.random.PRNGKey(2), (N, 3))

enc = model.pos_encoding
f_enc = jax.jit(lambda p, x: enc.apply(p, x))
t = bench(f_enc, params["pos_encoding"], pos)
print(f"encoding fwd  N=2^18: {t*1e3:8.3f} ms  -> {N/t/1e9:.2f} G samples/s")

f_dens = jax.jit(lambda p, x: model.density_features(p, x))
t = bench(f_dens, params, pos)
print(f"enc+densMLP   N=2^18: {t*1e3:8.3f} ms  -> {N/t/1e9:.2f} G/s")

f_full = jax.jit(lambda p, x, d: model(p, x, d))
t = bench(f_full, params, pos, dirs)
print(f"full fwd      N=2^18: {t*1e3:8.3f} ms  -> {N/t/1e9:.2f} G/s")

# MLP only (density mlp on random features)
feats = jax.random.normal(jax.random.PRNGKey(3), (N, 32))
f_mlp = jax.jit(lambda p, x: model.density_mlp.apply(p, x))
t = bench(f_mlp, params["density_mlp"], feats)
print(f"density MLP   N=2^18: {t*1e3:8.3f} ms")

# backward through encoding (scatter-add)
def loss_enc(p, x):
    return jnp.sum(enc.apply(p, x) ** 2)
g_enc = jax.jit(jax.grad(loss_enc))
t = bench(g_enc, params["pos_encoding"], pos)
print(f"encoding bwd  N=2^18: {t*1e3:8.3f} ms  -> {N/t/1e6:.0f} M samples/s")

# full fwd+bwd
def loss_full(p, x, d):
    rgb, sigma = model(p, x, d)
    return jnp.sum(rgb) + jnp.sum(sigma)
g_full = jax.jit(jax.grad(loss_full))
t = bench(g_full, params, pos, dirs)
print(f"full fwd+bwd  N=2^18: {t*1e3:8.3f} ms  -> {N/t/1e6:.0f} M samples/s")

# march
grid = grid_lib.OccupancyGrid.create(1)
grid = grid._replace(occupancy=jnp.ones_like(grid.occupancy),
                     skip=jnp.zeros_like(grid.skip))
R = 1 << 12
o = jnp.tile(jnp.asarray([[0.5, 0.5, -0.2]]), (R, 1))
d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
aabb = coords.BoundingBox.from_aabb_scale(1)
for nsteps in (96, 256, 1024):
    f = jax.jit(lambda o_, d_: march.march_rays_skip(
        o_, d_, grid.skip, aabb.min, aabb.max, jnp.asarray(0.0),
        k_samples=32, n_steps=nsteps))
    t = bench(f, o, d)
    print(f"march_skip R=2^12 n_steps={nsteps:5d}: {t*1e3:8.3f} ms")
for R2 in (1<<14, 1<<16):
    o2 = jnp.tile(jnp.asarray([[0.5, 0.5, -0.2]]), (R2, 1))
    d2 = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R2, 1))
    f = jax.jit(lambda o_, d_: march.march_rays_skip(
        o_, d_, grid.skip, aabb.min, aabb.max, jnp.asarray(0.0),
        k_samples=32, n_steps=256))
    t = bench(f, o2, d2)
    print(f"march_skip R=2^{int(np.log2(R2))} n_steps=256: {t*1e3:8.3f} ms")

# ladder march
for M in (512, 1024):
    f = jax.jit(lambda o_, d_: march.march_rays(
        o_, d_, grid.occupancy, aabb.min, aabb.max, jnp.asarray(0.0),
        k_samples=32, n_candidates=M))
    t = bench(f, o, d)
    print(f"march_ladder R=2^12 M={M}: {t*1e3:8.3f} ms")
