import sys, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = int(sys.argv[1])
x = jax.random.normal(jax.random.PRNGKey(0), (S, 128), jnp.float32)
gi = jax.random.randint(jax.random.PRNGKey(1), (S, 128), 0, S, jnp.int32)
def kern(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
fp = jax.jit(lambda x, i: pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x, i))
out = fp(x, gi)
ok = np.allclose(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(gi), 0))
print(f"ax0 S={S}: {'OK' if ok else 'WRONG'}")
