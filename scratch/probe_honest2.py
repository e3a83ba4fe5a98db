import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench_unique(fn, mk_args, n=16, warm=2):
    args = [mk_args(i) for i in range(n + warm)]
    for a in args:  jax.block_until_ready(a)
    for i in range(warm):
        out = fn(*args[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args[warm + i]) for i in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n

# 1. dispatch floor with unique args
f_add = jax.jit(lambda x: x + 1.0)
dt = bench_unique(f_add, lambda i: (jnp.full((8, 128), float(i)),), n=32)
print(f"dispatch floor (unique): {dt*1e3:8.3f} ms")

# 2. MLP-ish chain 2^18
N = 1 << 18
W1 = jax.random.normal(jax.random.PRNGKey(0), (32, 64), jnp.bfloat16)
W2 = jax.random.normal(jax.random.PRNGKey(1), (64, 64), jnp.bfloat16)
W3 = jax.random.normal(jax.random.PRNGKey(2), (64, 16), jnp.bfloat16)
def mlp(x):
    h = jax.nn.relu(jnp.dot(x, W1, preferred_element_type=jnp.float32)).astype(jnp.bfloat16)
    h = jax.nn.relu(jnp.dot(h, W2, preferred_element_type=jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(h, W3, preferred_element_type=jnp.float32)
f_mlp = jax.jit(mlp)
dt = bench_unique(f_mlp, lambda i: (jax.random.normal(jax.random.PRNGKey(100+i), (N, 32), jnp.bfloat16),), n=8)
flops = N * (32*64 + 64*64 + 64*16) * 2
print(f"MLP 2^18x(32-64-64-16): {dt*1e3:8.3f} ms -> {flops/dt/1e12:.1f} TFLOP/s, {N/dt/1e9:.2f}G rows/s")

# 3. big matmul
A = [jax.random.normal(jax.random.PRNGKey(200+i), (4096, 4096), jnp.bfloat16) for i in range(6)]
B = jax.random.normal(jax.random.PRNGKey(300), (4096, 4096), jnp.bfloat16)
f_mm = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
dt = bench_unique(f_mm, lambda i: (A[i % 6], B), n=6)
print(f"matmul 4096^3 bf16: {dt*1e3:8.3f} ms -> {2*4096**3/dt/1e12:.1f} TFLOP/s")

# 4. flat gather 1M unique, array output (no sum)
ncell = 5 * 128**3
occ = (jax.random.uniform(jax.random.PRNGKey(20), (ncell,)) < 0.1)
f_g = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
dt = bench_unique(f_g, lambda i: (occ, jax.random.randint(jax.random.PRNGKey(400+i), (4096, 256), 0, ncell, jnp.int32)), n=8)
print(f"flat gather 1M (array out): {dt*1e3:8.3f} ms -> {4096*256/dt/1e6:.0f}M/s")

# 4b. row gather [T,2] 1M unique
tab = jax.random.normal(jax.random.PRNGKey(21), (1 << 19, 2))
f_g2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
dt = bench_unique(f_g2, lambda i: (tab, jax.random.randint(jax.random.PRNGKey(500+i), (1 << 20,), 0, 1 << 19, jnp.int32)), n=8)
print(f"row gather 1M from [2^19,2]: {dt*1e3:8.3f} ms -> {2**20/dt/1e6:.0f}M rows/s")

# 5. pallas ax1 gather honest: [Q,128] idx<128
Q = 1 << 16
xsrc = jax.random.normal(jax.random.PRNGKey(600), (Q, 128), jnp.float32)
def kern(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
f_p = jax.jit(lambda x, i: pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, i))
dt = bench_unique(f_p, lambda i: (xsrc, jax.random.randint(jax.random.PRNGKey(700+i), (Q, 128), 0, 128, jnp.int32)), n=8)
print(f"pallas ax1 gather {Q*128/1e6:.0f}M lookups: {dt*1e3:8.3f} ms -> {Q*128/dt/1e9:.2f}G/s")

# 6. cumsum [8192,1024] unique
f_c = jax.jit(lambda x: jnp.cumsum(x, axis=1))
dt = bench_unique(f_c, lambda i: (jax.random.uniform(jax.random.PRNGKey(800+i), (8192, 1024)),), n=8)
print(f"cumsum [8192,1024]: {dt*1e3:8.3f} ms")

# 7. top_k [8192,1024]->32 unique
f_t = jax.jit(lambda x: jax.lax.top_k(x, 32))
dt = bench_unique(f_t, lambda i: (jax.random.uniform(jax.random.PRNGKey(900+i), (8192, 1024)),), n=8)
print(f"top_k [8192,1024]->32: {dt*1e3:8.3f} ms")

# 8. take_along_axis [8192,1024] by [8192,32] unique (binary search step cost)
xs2 = jax.random.uniform(jax.random.PRNGKey(1000), (8192, 1024))
f_ta = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1))
dt = bench_unique(f_ta, lambda i: (xs2, jax.random.randint(jax.random.PRNGKey(1100+i), (8192, 32), 0, 1024, jnp.int32)), n=8)
print(f"take_along [8192,1024] K=32: {dt*1e3:8.3f} ms")
