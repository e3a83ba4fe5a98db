import time, functools, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench_unique(fn, mk_args, n=8, warm=2):
    args = [mk_args(i) for i in range(n + warm)]
    for a in args: jax.block_until_ready(a)
    for i in range(warm): out = fn(*args[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args[warm + i]) for i in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n

NQ = 1 << 20
f_g = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
for T in (256, 4096, 65536, 1 << 19):
    tab = jax.random.normal(jax.random.PRNGKey(0), (T, 2))
    dt = bench_unique(f_g, lambda i: (tab, jax.random.randint(jax.random.PRNGKey(i), (NQ,), 0, T, jnp.int32)))
    print(f"gather 1M from [{T},2]: {dt*1e3:7.3f} ms -> {NQ/dt/1e6:.0f}M/s")

for W in (32, 128):
    tab = jax.random.normal(jax.random.PRNGKey(1), (1 << 16, W))
    dt = bench_unique(f_g, lambda i: (tab, jax.random.randint(jax.random.PRNGKey(i), (NQ,), 0, 1 << 16, jnp.int32)))
    print(f"gather 1M from [2^16,{W}]: {dt*1e3:7.3f} ms -> {NQ/dt/1e6:.0f}M rows/s ({NQ*W*4/dt/1e9:.0f}GB/s)")

# Pallas ax1 gather, blocked grid
Q = 1 << 16
BLK = 2048
def kern(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
f_p = jax.jit(lambda x, i: pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.float32),
    grid=(Q // BLK,),
    in_specs=[pl.BlockSpec((BLK, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec((BLK, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
)(x, i))
xsrc = jax.random.normal(jax.random.PRNGKey(2), (Q, 128), jnp.float32)
out = f_p(xsrc, jax.random.randint(jax.random.PRNGKey(3), (Q, 128), 0, 128, jnp.int32))
exp = np.take_along_axis(np.asarray(xsrc), np.asarray(jax.random.randint(jax.random.PRNGKey(3), (Q, 128), 0, 128, jnp.int32)), 1)
print("pallas ax1 blocked correct:", np.allclose(np.asarray(out), exp))
dt = bench_unique(f_p, lambda i: (xsrc, jax.random.randint(jax.random.PRNGKey(100+i), (Q, 128), 0, 128, jnp.int32)))
print(f"pallas ax1 blocked {Q*128/1e6:.0f}M lookups: {dt*1e3:7.3f} ms -> {Q*128/dt/1e9:.2f}G/s")

# Pallas fused MLP: 2^18 rows of 32 -> 64 -> 64 -> 16, weights in VMEM
N = 1 << 18
BLKN = 1 << 13
W1 = jax.random.normal(jax.random.PRNGKey(4), (32, 64), jnp.float32).astype(jnp.bfloat16)
W2 = jax.random.normal(jax.random.PRNGKey(5), (64, 64), jnp.float32).astype(jnp.bfloat16)
W3 = jax.random.normal(jax.random.PRNGKey(6), (64, 16), jnp.float32).astype(jnp.bfloat16)
def mlp_kern(x_ref, w1_ref, w2_ref, w3_ref, o_ref):
    h = jnp.maximum(jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32), 0.).astype(jnp.bfloat16)
    h = jnp.maximum(jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32), 0.).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
f_mlp = jax.jit(lambda x, w1, w2, w3: pl.pallas_call(
    mlp_kern,
    out_shape=jax.ShapeDtypeStruct((N, 16), jnp.float32),
    grid=(N // BLKN,),
    in_specs=[pl.BlockSpec((BLKN, 32), lambda b: (b, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((32, 64), lambda b: (0, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((64, 64), lambda b: (0, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((64, 16), lambda b: (0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((BLKN, 16), lambda b: (b, 0), memory_space=pltpu.VMEM),
)(x, w1, w2, w3))
x0 = jax.random.normal(jax.random.PRNGKey(7), (N, 32), jnp.bfloat16)
out = f_mlp(x0, W1, W2, W3)
# reference
ref = np.maximum(np.asarray(x0, np.float32) @ np.asarray(W1, np.float32), 0)
ref = np.maximum(ref @ np.asarray(W2, np.float32), 0) @ np.asarray(W3, np.float32)
print("pallas mlp correct:", np.allclose(np.asarray(out), ref, rtol=0.1, atol=0.5))
dt = bench_unique(f_mlp, lambda i: (jax.random.normal(jax.random.PRNGKey(200+i), (N, 32), jnp.bfloat16), W1, W2, W3))
flops = N * (32*64 + 64*64 + 64*16) * 2
print(f"pallas fused MLP 2^18: {dt*1e3:7.3f} ms -> {flops/dt/1e12:.1f} TFLOP/s, {N/dt/1e9:.2f}G rows/s")

# one-hot row-select matmul: [Q,128] onehot @ [128,256] table per level
Qs = 1 << 21
oh_idx = jax.random.randint(jax.random.PRNGKey(8), (Qs,), 0, 128, jnp.int32)
TB = jax.random.normal(jax.random.PRNGKey(9), (128, 256), jnp.bfloat16)
def onehot_gather(idx, tb):
    oh = (idx[:, None] == jnp.arange(128)[None, :]).astype(jnp.bfloat16)
    return jnp.dot(oh, tb, preferred_element_type=jnp.float32)
f_oh = jax.jit(onehot_gather)
dt = bench_unique(f_oh, lambda i: (jax.random.randint(jax.random.PRNGKey(300+i), (Qs,), 0, 128, jnp.int32), TB))
print(f"onehot row-select 2M x [128,256]: {dt*1e3:7.3f} ms -> {Qs/dt/1e9:.2f}G rows/s")
