"""Isolate the ct128 build and batched [Lb,N,128] cumsum costs."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 18
Lb = 13
ITERS = 6
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
CT = jax.device_put(rng.normal(size=(Lb, N, 16)).astype(np.float32))
KB = jax.device_put(rng.integers(0, 1 << 19, (Lb, N)).astype(np.int32))
C128 = jax.device_put(rng.normal(size=(Lb, N, 128)).astype(np.float32))


def chain_time(name, make_fn, *args):
    f_many = make_fn(ITERS)
    f_one = make_fn(1)
    ks = jax.random.split(key, 4)
    float(np.asarray(f_many(*args, ks[0])))
    float(np.asarray(f_one(*args, ks[1])))
    t0 = time.perf_counter()
    float(np.asarray(f_one(*args, ks[2])))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(f_many(*args, ks[3])))
    t_many = time.perf_counter() - t0
    per = (t_many - t_one) / (ITERS - 1)
    print(f"{name:46s} {per*1e3:8.2f} ms  (1-iter {t_one*1e3:6.1f} ms)", flush=True)
    return per


def mk_ct128(iters):
    @jax.jit
    def f(ct, kb, k):
        def body(i, c):
            j = ((kb + c.astype(jnp.int32)) % 8)[..., None]
            ct128 = jnp.concatenate([jnp.where(j == kk, ct, 0.0) for kk in range(8)], axis=-1)
            return ct128.sum() % 16.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_cumsum3d(iters):
    @jax.jit
    def f(x, k):
        def body(i, c):
            return jnp.cumsum(x + c * 1e-30, axis=1).sum() % 16.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_cumsum2d_loop(iters):
    @jax.jit
    def f(x, k):
        def body(i, c):
            acc = c
            for l in range(Lb):
                acc = acc + jnp.cumsum(x[l] + c * 1e-30, axis=0).sum() % 16.0
            return acc

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_cumsum_assoc(iters):
    @jax.jit
    def f(x, k):
        def body(i, c):
            y = jax.lax.associative_scan(jnp.add, x + c * 1e-30, axis=1)
            return y.sum() % 16.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_cumsum_blocked(iters):
    # two-level: block-sums of 16 rows -> small cumsum -> broadcast add +
    # within-block cumsum
    B = 16

    @jax.jit
    def f(x, k):
        def body(i, c):
            xb = (x + c * 1e-30).reshape(Lb, N // B, B, 128)
            bs = xb.sum(axis=2)  # [Lb, N/B, 128]
            pre = jnp.cumsum(bs, axis=1) - bs  # exclusive block prefix
            within = jnp.cumsum(xb, axis=2)
            y = within + pre[:, :, None, :]
            return y.sum() % 16.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


chain_time("ct128 build (where-concat) [13,N,128]", mk_ct128, CT, KB)
chain_time("cumsum 3d [13,N,128] axis=1", mk_cumsum3d, C128)
chain_time("cumsum 2d loop x13 [N,128]", mk_cumsum2d_loop, C128)
chain_time("assoc_scan 3d [13,N,128]", mk_cumsum_assoc, C128)
chain_time("blocked cumsum [13,N,128]", mk_cumsum_blocked, C128)
