"""Probe: per-lane dynamic gather inside a Pallas TPU kernel."""
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]                     # [N] int32
    out_ref[:] = jnp.take(tab_ref[:], idx, axis=0)

T, N = 4096, 1024
tab = jnp.arange(T, dtype=jnp.float32) * 2.0
idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, T, jnp.int32)

try:
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    ok = np.allclose(np.asarray(out), np.asarray(tab)[np.asarray(idx)])
    print("1D take:", "OK" if ok else "WRONG")
except Exception as e:
    print("1D take FAILED:", type(e).__name__, str(e)[:300])

# 2D: gather rows of a [T, F] table
def kern2(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]                     # [N]
    out_ref[:] = jnp.take(tab_ref[:], idx, axis=0)  # [N, F]

F = 128
tab2 = jax.random.normal(jax.random.PRNGKey(1), (T, F), jnp.float32)
try:
    out = pl.pallas_call(
        kern2,
        out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab2, idx)
    ok = np.allclose(np.asarray(out), np.asarray(tab2)[np.asarray(idx)])
    print("2D row take:", "OK" if ok else "WRONG")
except Exception as e:
    print("2D row take FAILED:", type(e).__name__, str(e)[:300])

# take_along_axis on lane dim
def kern3(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

M, L = 256, 512
tab3 = jax.random.normal(jax.random.PRNGKey(2), (M, L), jnp.float32)
idx3 = jax.random.randint(jax.random.PRNGKey(3), (M, 128), 0, L, jnp.int32)
try:
    out = pl.pallas_call(
        kern3,
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab3, idx3)
    ok = np.allclose(np.asarray(out), np.take_along_axis(np.asarray(tab3), np.asarray(idx3), 1))
    print("take_along_axis lane:", "OK" if ok else "WRONG")
except Exception as e:
    print("take_along_axis FAILED:", type(e).__name__, str(e)[:300])
