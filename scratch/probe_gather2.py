import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    out = jax.block_until_ready(out)
    # force a tiny D2H to be extra sure completion happened
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt

# 1) XLA row gather like the hash encoding: [2M] indices from [524288, 2]
T, F = 1 << 19, 2
tab = jax.random.normal(jax.random.PRNGKey(0), (T, F))
idx = jax.random.randint(jax.random.PRNGKey(1), (1 << 21,), 0, T, jnp.int32)
f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
dt = bench(f, tab, idx)
print(f"XLA row-gather 2M from [2^19,2] (sum-forced): {dt*1e3:8.3f} ms -> {2**21/dt/1e6:.0f}M rows/s")

# 1b) encoding-shaped: idx [N, L, C] from [T, F]
N, L, C = 1 << 18, 16, 8
idx3 = jax.random.randint(jax.random.PRNGKey(2), (N, L, C), 0, T, jnp.int32)
f2 = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
dt = bench(f2, tab, idx3)
print(f"XLA enc-shaped gather 34M rows (sum-forced):  {dt*1e3:8.3f} ms -> {N*L*C/dt/1e6:.0f}M rows/s")

# 2) Pallas dynamic_gather axis=0 (same-shape): operand [S,128], idx [S,128]
for S in (1024, 8192):
    x = jax.random.normal(jax.random.PRNGKey(3), (S, 128))
    gi = jax.random.randint(jax.random.PRNGKey(4), (S, 128), 0, S, jnp.int32)
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    try:
        fp = jax.jit(lambda x, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i))
        out = fp(x, gi)
        ok = np.allclose(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(gi), 0))
        dt = bench(fp, x, gi)
        print(f"Pallas dyngather ax0 S={S}: {'OK' if ok else 'WRONG'} {dt*1e3:8.3f} ms -> {S*128/dt/1e9:.2f}G lookups/s")
    except Exception as e:
        print(f"Pallas dyngather ax0 S={S} FAILED: {type(e).__name__} {str(e)[:200]}")

# 3) Pallas dynamic_gather axis=1 with minor dim > 128
for Mm in (128, 512):
    x = jax.random.normal(jax.random.PRNGKey(5), (256, Mm))
    gi = jax.random.randint(jax.random.PRNGKey(6), (256, Mm), 0, Mm, jnp.int32)
    def kern1(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    try:
        fp = jax.jit(lambda x, i: pl.pallas_call(
            kern1,
            out_shape=jax.ShapeDtypeStruct((256, Mm), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, gi))
        out = fp(x, gi)
        ok = np.allclose(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(gi), 1))
        dt = bench(fp, x, gi)
        print(f"Pallas dyngather ax1 M={Mm}: {'OK' if ok else 'WRONG'} {dt*1e3:8.3f} ms")
    except Exception as e:
        print(f"Pallas dyngather ax1 M={Mm} FAILED: {type(e).__name__} {str(e)[:200]}")

# 4) big replicated-table gather kernel: table [8192,128], queries [Q] blocked [Qs,128]
S = 8192
Qs = 8192  # same-shape constraint: idx shape == operand shape
x = jax.random.normal(jax.random.PRNGKey(7), (S, 128))
gi = jax.random.randint(jax.random.PRNGKey(8), (Qs, 128), 0, S, jnp.int32)
def kern2(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
try:
    fp = jax.jit(lambda x, i: pl.pallas_call(
        kern2,
        out_shape=jax.ShapeDtypeStruct((Qs, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, gi))
    out = fp(x, gi)
    ok = np.allclose(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(gi), 0))
    dt = bench(fp, x, gi)
    print(f"Pallas 1M-lookup kernel: {'OK' if ok else 'WRONG'} {dt*1e3:8.3f} ms -> {Qs*128/dt/1e9:.2f}G lookups/s")
except Exception as e:
    print(f"Pallas 1M-lookup FAILED: {type(e).__name__} {str(e)[:200]}")
