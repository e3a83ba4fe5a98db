"""Decompose the sort-branch backward: 6-op sort / rebuild / cumsum / hist /
monotone boundary gather / corner-reduce, all in-program chained."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.ops import table_ops

N = 1 << 18
m = 1 << 19
Lb = 13
F = 2
C = 8
w = 16
ITERS = 6
key = jax.random.PRNGKey(0)

rng = np.random.default_rng(0)
IDX = jax.device_put(rng.integers(0, m, (Lb, N)).astype(np.int32))
W1 = jax.device_put(rng.uniform(0, 1, (Lb, N, 3)).astype(np.float32))
DO = jax.device_put(rng.normal(size=(Lb, N, F)).astype(np.float32))
CT = jax.device_put(rng.normal(size=(Lb, N, w)).astype(np.float32))
CS = jax.device_put(rng.normal(size=(Lb, N + 1, w)).astype(np.float32))
DB = jax.device_put(rng.normal(size=(m, w)).astype(np.float32))
shifts = [0, 1, 2654435761 % m, (1 + 2654435761) % m, 805459861 % m,
          (1 + 805459861) % m, (2654435761 + 805459861) % m,
          (1 + 2654435761 + 805459861) % m]


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


def mk_sort6(iters):
    @jax.jit
    def f(idx, w1, do, k):
        def body(i, c):
            kb = (idx + c.astype(jnp.int32)) & (m - 1)
            ops = (kb, w1[..., 0], w1[..., 1], w1[..., 2], do[..., 0], do[..., 1])
            so = jax.lax.sort(ops, dimension=1, num_keys=1)
            return sum((o * (j + 1)).sum() % 16.0 for j, o in enumerate(so[1:])) + so[0].sum() % 16.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_sort2(iters):
    @jax.jit
    def f(idx, k):
        def body(i, c):
            kb = (idx + c.astype(jnp.int32)) & (m - 1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (Lb, N), 1)
            so = jax.lax.sort_key_val(kb, iota, dimension=1)
            return ((so[0] * iota).sum() + (so[1] * iota).sum()).astype(jnp.float32) % 16.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_rebuild(iters):
    @jax.jit
    def f(w1, do, k):
        def body(i, c):
            w8 = table_ops.corner_products(w1 + c * 1e-30)
            ct = (w8[..., :, None] * do[..., None, :]).reshape(Lb, N, w)
            return ct.sum() % 16.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_cumsum(iters):
    @jax.jit
    def f(ct, k):
        def body(i, c):
            return jnp.cumsum(ct + c * 1e-30, axis=1).sum() % 16.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_hist13(iters):
    @jax.jit
    def f(idx, k):
        def body(i, c):
            ii = (idx + c.astype(jnp.int32)) & (m - 1)
            ii = jax.lax.optimization_barrier(ii)
            acc = c
            for l in range(Lb):
                h = table_ops.exact_histogram(ii[l], m)
                acc = acc + (h[::257]).sum() % 16.0
            return acc

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_hist_batched(iters):
    @jax.jit
    def f(idx, k):
        def body(i, c):
            ii = (idx + c.astype(jnp.int32)) & (m - 1)
            ii = jax.lax.optimization_barrier(ii)
            hi = (ii >> 7).astype(jnp.int32)
            lo = (ii & 127).astype(jnp.int32)
            A = (hi[..., None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, m // 128), 2)).astype(jnp.bfloat16)
            B = (lo[..., None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)).astype(jnp.bfloat16)
            hh = jnp.einsum("lnh,lnb->lhb", A, B, preferred_element_type=jnp.float32)
            return (hh[:, ::33, ::17]).sum() % 16.0 + c

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_bgather_mono(iters):
    # monotone sorted boundary indices, gathered per level from [N+1, w]
    @jax.jit
    def f(cs, idx, k):
        def body(i, c):
            acc = c
            for l in range(Lb):
                # emulate [m+1] monotone boundaries: a sorted m+1 vector
                bb = jnp.clip((jax.lax.broadcasted_iota(jnp.int32, (m + 1, 1), 0)[:, 0] // 2)
                              + c.astype(jnp.int32), 0, N)
                bb = jax.lax.optimization_barrier(bb)
                cl = jax.lax.optimization_barrier(cs[l])
                acc = acc + jnp.take(cl, bb, axis=0)[::129].sum() % 16.0
            return acc

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_reduce(iters):
    @jax.jit
    def f(db, k):
        def body(i, c):
            acc = None
            g = (db + c * 1e-30).reshape(m, C, F)
            for ci, s in enumerate(shifts):
                gc = g[:, ci, :]
                gc = gc if s == 0 else jnp.roll(gc, s, axis=0)
                acc = gc if acc is None else acc + gc
            return acc.sum() % 16.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


chain_time("sort 6-op [13,N]", mk_sort6, IDX, W1, DO)
chain_time("sort 2-op [13,N]", mk_sort2, IDX)
chain_time("rebuild ct (w8 outer) [13,N,16]", mk_rebuild, W1, DO)
chain_time("cumsum batched [13,N,16]", mk_cumsum, CT)
chain_time("hist x13 loop", mk_hist13, IDX)
chain_time("hist x13 batched einsum", mk_hist_batched, IDX)
chain_time("boundary gather monotone x13", mk_bgather_mono, CS, IDX)
chain_time("corner reduce rolls x13(1lvl x13?)", lambda it: mk_reduce(it), DB)
