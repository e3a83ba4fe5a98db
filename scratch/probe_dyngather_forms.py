import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_form(name, S, Q, dtype, axis, lanes=128):
    x = jnp.arange(S * lanes, dtype=dtype).reshape(S, lanes) if dtype != jnp.float32 else \
        jax.random.normal(jax.random.PRNGKey(0), (S, lanes), jnp.float32)
    if axis == 0:
        gi = jax.random.randint(jax.random.PRNGKey(1), (Q, lanes), 0, S, jnp.int32)
        out_shape = (Q, lanes)
    else:
        gi = jax.random.randint(jax.random.PRNGKey(1), (Q, lanes), 0, lanes, jnp.int32)
        out_shape = (Q, lanes)
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)
    try:
        fp = jax.jit(lambda x, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i))
        out = fp(x, gi)
        exp = np.take_along_axis(np.asarray(x), np.asarray(gi), axis) if (Q == S or axis==1) else None
        ok = "OK" if exp is None or np.allclose(np.asarray(out), exp) else "WRONG"
        print(f"{name}: compiled {ok}")
        return fp, x, gi
    except Exception as e:
        msg = str(e).replace("\n", " ")[:150]
        print(f"{name}: FAIL {type(e).__name__} {msg}")
        return None, None, None

# axis 0, small shapes, f32
try_form("ax0 S=8 Q=8 f32", 8, 8, jnp.float32, 0)
try_form("ax0 S=128 Q=128 f32", 128, 128, jnp.float32, 0)
try_form("ax0 S=128 Q=128 i32", 128, 128, jnp.int32, 0)
try_form("ax0 S=512 Q=512 f32", 512, 512, jnp.float32, 0)
# mismatched Q vs S
try_form("ax0 S=128 Q=256 f32", 128, 256, jnp.float32, 0)
# axis 1 at bigger row counts
try_form("ax1 Q=1024 f32", 1024, 1024, jnp.float32, 1)
try_form("ax1 Q=4096 f32", 4096, 4096, jnp.float32, 1)
