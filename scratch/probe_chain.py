"""Dependency-chain timing: K dependent reps inside one jit; slope = true op cost."""
import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(f, *args, n=6):
    out = f(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

def chain_cost(make_chain, label, unit_count, k_lo=2, k_hi=18):
    f_lo = jax.jit(make_chain(k_lo)); f_hi = jax.jit(make_chain(k_hi))
    t_lo = timeit(f_lo); t_hi = timeit(f_hi)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    print(f"{label}: {per*1e3:8.3f} ms/op -> {unit_count/max(per,1e-9)/1e6:.0f}M units/s   (lo={t_lo*1e3:.2f} hi={t_hi*1e3:.2f})")
    return per

# 1. gather chain: idx evolves from gathered values
NQ = 1 << 20
for T in (256, 65536, 1 << 19):
    tab = jax.random.normal(jax.random.PRNGKey(0), (T, 2))
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (NQ,), 0, T, jnp.int32)
    def mk(K, tab=tab, T=T):
        def f(tab, idx):
            for _ in range(K):
                g = jnp.take(tab, idx, axis=0)              # [NQ,2]
                idx = (idx + g[:, 0].astype(jnp.int32) + 7) % T
            return idx
        return lambda: f(tab, idx0)
    chain_cost(mk, f"gather 1M from [{T},2]", NQ)

# 2. MLP chain
N = 1 << 18
W1 = jax.random.normal(jax.random.PRNGKey(4), (32, 64), jnp.bfloat16)
W2 = jax.random.normal(jax.random.PRNGKey(5), (64, 64), jnp.bfloat16)
W3 = jax.random.normal(jax.random.PRNGKey(6), (64, 32), jnp.bfloat16)
x0 = jax.random.normal(jax.random.PRNGKey(7), (N, 32), jnp.bfloat16)
def mkmlp(K):
    def f(x):
        for _ in range(K):
            h = jax.nn.relu(jnp.dot(x, W1, preferred_element_type=jnp.float32)).astype(jnp.bfloat16)
            h = jax.nn.relu(jnp.dot(h, W2, preferred_element_type=jnp.float32)).astype(jnp.bfloat16)
            x = jnp.dot(h, W3, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return x
    return lambda: f(x0)
per = chain_cost(mkmlp, "XLA MLP 2^18 (32-64-64-32)", N)
print(f"   -> {N*(32*64+64*64+64*32)*2/per/1e12:.2f} TFLOP/s")

# 3. big matmul chain
A0 = jax.random.normal(jax.random.PRNGKey(8), (4096, 4096), jnp.bfloat16)
B0 = jax.random.normal(jax.random.PRNGKey(9), (4096, 4096), jnp.bfloat16)
def mkmm(K):
    def f(a, b):
        for _ in range(K):
            a = jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16) * 1e-3
        return a
    return lambda: f(A0, B0)
per = chain_cost(mkmm, "matmul 4096^3", 1, 2, 10)
print(f"   -> {2*4096**3/per/1e12:.1f} TFLOP/s")

# 4. pallas ax1 chain (idx from data)
Q = 1 << 16; BLK = 2048
def kern(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:] & 127, axis=1)
pcall = lambda x, i: pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.float32),
    grid=(Q // BLK,),
    in_specs=[pl.BlockSpec((BLK, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec((BLK, 128), lambda b: (b, 0), memory_space=pltpu.VMEM))(x, i)
xs = jax.random.normal(jax.random.PRNGKey(10), (Q, 128), jnp.float32)
ii = jax.random.randint(jax.random.PRNGKey(11), (Q, 128), 0, 128, jnp.int32)
def mkp(K):
    def f(x, i):
        for _ in range(K):
            y = pcall(x, i)
            i = (i + y.astype(jnp.int32) + 1) & 127
        return i
    return lambda: f(xs, ii)
chain_cost(mkp, "pallas ax1 8.4M lookups", Q * 128)

# 5. cumsum chain [8192,1024]
c0 = jax.random.uniform(jax.random.PRNGKey(12), (8192, 1024))
def mkc(K):
    def f(x):
        for _ in range(K):
            x = jnp.cumsum(x, axis=1) * 1e-3 + x * 0.5
        return x
    return lambda: f(c0)
chain_cost(mkc, "cumsum [8192,1024]", 8192 * 1024)

# 6. top_k chain
def mkt(K):
    def f(x):
        for _ in range(K):
            v, _ = jax.lax.top_k(x, 32)
            x = x + jnp.pad(v, ((0, 0), (0, 1024 - 32))) * 1e-3
        return x
    return lambda: f(c0)
chain_cost(mkt, "top_k [8192,1024]->32", 8192)
