import time, jax, jax.numpy as jnp, numpy as np

def run(fn, args_list, n):
    t0 = time.perf_counter()
    outs = [fn(*args_list[i]) for i in range(n)]
    jax.block_until_ready(outs)
    # force a real D2H touch of each output
    s = sum(float(np.asarray(o if not isinstance(o, tuple) else o[0]).ravel()[0]) for o in outs)
    t1 = time.perf_counter()
    return t1 - t0, s

ncell = 5 * 128**3
occ = (jax.random.uniform(jax.random.PRNGKey(20), (ncell,)) < 0.1)
f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0).astype(jnp.int32)))

for R, M in ((1 << 14, 1024), (1 << 12, 256)):
    # 32 UNIQUE index arrays
    idxs = [(occ, jax.random.randint(jax.random.PRNGKey(100 + i), (R, M), 0, ncell, jnp.int32)) for i in range(32)]
    jax.block_until_ready([i[1] for i in idxs])
    _ = run(f, idxs, 2)  # warm/compile
    t5, _ = run(f, idxs[:8], 8)
    t30, _ = run(f, idxs, 32)
    per = (t30 - t5) / 24
    print(f"flat gather sum R*M={R*M/1e6:.1f}M: 8 calls {t5*1e3:.2f} ms, 32 calls {t30*1e3:.2f} ms -> {per*1e3:.3f} ms/call")

# encoding fwd with unique inputs + big output
from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
model = build_nerf_network(default_nerf_config(), aabb_scale=1)
params = model.init(jax.random.PRNGKey(0))
N = 1 << 18
fe = jax.jit(lambda p, x, d: model(p, x, d))
ins = [(params, jax.random.uniform(jax.random.PRNGKey(200 + i), (N, 3)),
        jax.random.uniform(jax.random.PRNGKey(300 + i), (N, 3))) for i in range(32)]
jax.block_until_ready([i[1] for i in ins])
_ = run(fe, ins, 2)
t5, _ = run(fe, ins[:8], 8)
t30, _ = run(fe, ins, 32)
per = (t30 - t5) / 24
print(f"full fwd 2^18 unique inputs: 8 calls {t5*1e3:.2f} ms, 32 calls {t30*1e3:.2f} ms -> {per*1e3:.3f} ms/call -> {N/per/1e9:.2f}G samples/s")
