"""Honest benches: vary inputs each iter, consume outputs, subtract dispatch floor."""
import time, jax, jax.numpy as jnp, numpy as np

def bench(fn, args_list, iters=12, warmup=3):
    for i in range(warmup):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(*args_list[i % len(args_list)]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters

# dispatch floor
x0 = jnp.ones((8, 128))
f0 = jax.jit(lambda x: x + 1.0)
floor = bench(f0, [(x0,)], iters=50)
print(f"dispatch floor: {floor*1e3:.3f} ms")

T, F = 1 << 19, 2
tab = jax.random.normal(jax.random.PRNGKey(0), (T, F))
N = 1 << 21
idxs = [jax.random.randint(jax.random.PRNGKey(i), (N,), 0, T, jnp.int32) for i in range(4)]
f1 = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0), axis=0))
dt = bench(f1, [(tab, i) for i in idxs])
print(f"XLA row-gather 2M from [2^19,2]: {dt*1e3:8.3f} ms -> {N/dt/1e6:.0f}M rows/s")

# encoding-shaped 34M
N2, L, C = 1 << 18, 16, 8
idx3s = [jax.random.randint(jax.random.PRNGKey(10+i), (N2, L, C), 0, T, jnp.int32) for i in range(3)]
f2 = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0), axis=(0,1,2)))
dt = bench(f2, [(tab, i) for i in idx3s])
print(f"XLA enc-shaped 34M rows: {dt*1e3:8.3f} ms -> {N2*L*C/dt/1e6:.0f}M rows/s")

# 1D-operand gather (march shape): [R, M] idx over flat [10M]
ncell = 5 * 128**3
occ = (jax.random.uniform(jax.random.PRNGKey(20), (ncell,)) < 0.1)
R, M = 1 << 14, 1024
midxs = [jax.random.randint(jax.random.PRNGKey(30+i), (R, M), 0, ncell, jnp.int32) for i in range(3)]
f3 = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0).astype(jnp.int32)))
dt = bench(f3, [(occ, i) for i in midxs])
print(f"XLA flat-gather 16M from bool[10M]: {dt*1e3:8.3f} ms -> {R*M/dt/1e6:.0f}M/s")

# same via 2D row-gather: occ2d [ncell, 1]
occ2d = occ[:, None]
f4 = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i.reshape(-1), axis=0).astype(jnp.int32)))
dt = bench(f4, [(occ2d, i) for i in midxs])
print(f"XLA row-gather 16M from bool[10M,1]: {dt*1e3:8.3f} ms -> {R*M/dt/1e6:.0f}M/s")

# f32 2D table version [ncell, 2] (same dtype as encoding)
occf = jnp.stack([occ.astype(jnp.float32)]*2, 1)
f5 = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i.reshape(-1), axis=0)))
dt = bench(f5, [(occf, i) for i in midxs])
print(f"XLA row-gather 16M from f32[10M,2]: {dt*1e3:8.3f} ms -> {R*M/dt/1e6:.0f}M/s")

# encoding fwd/bwd honest
from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
model = build_nerf_network(default_nerf_config(), aabb_scale=1)
params = model.init(jax.random.PRNGKey(0))
Nb = 1 << 18
poss = [jax.random.uniform(jax.random.PRNGKey(40+i), (Nb, 3)) for i in range(3)]
dirss = [jax.random.uniform(jax.random.PRNGKey(50+i), (Nb, 3)) for i in range(3)]
ffwd = jax.jit(lambda p, x, d: jnp.sum(model(p, x, d)[0]))
dt = bench(ffwd, [(params, x, d) for x, d in zip(poss, dirss)])
print(f"full fwd 2^18 (sum): {dt*1e3:8.3f} ms -> {Nb/dt/1e9:.2f}G samples/s")

def loss_full(p, x, d):
    rgb, sigma = model(p, x, d)
    return jnp.sum(rgb) + jnp.sum(sigma)
fbwd = jax.jit(lambda p, x, d: jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), jax.grad(loss_full)(p, x, d)))
dt = bench(fbwd, [(params, x, d) for x, d in zip(poss, dirss)])
print(f"full fwd+bwd 2^18: {dt*1e3:8.3f} ms -> {Nb/dt/1e6:.0f}M samples/s")

# top_k and take_along honest
xs = [jax.random.uniform(jax.random.PRNGKey(60+i), (R, M)) for i in range(3)]
f6 = jax.jit(lambda x: jnp.sum(jax.lax.top_k(x, 32)[0]))
dt = bench(f6, [(x,) for x in xs])
print(f"top_k [2^14,1024]->32: {dt*1e3:8.3f} ms")
ik = [jax.random.randint(jax.random.PRNGKey(70+i), (R, 32), 0, M, jnp.int32) for i in range(3)]
f7 = jax.jit(lambda x, i: jnp.sum(jnp.take_along_axis(x, i, axis=1)))
dt = bench(f7, [(x, i) for x, i in zip(xs, ik)])
print(f"take_along [2^14,1024] by K=32: {dt*1e3:8.3f} ms")
