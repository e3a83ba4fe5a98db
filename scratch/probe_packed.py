"""Probe: packed 128-lane table layouts vs narrow-row layouts, measured with
IN-PROGRAM dependency chains.

Methodology (the only honest one through the serving relay): each op runs
ITERS times inside ONE jitted program via lax.fori_loop whose carry feeds the
next iteration's inputs (the relay cannot elide or memoize per-iteration),
and the single scalar result is materialized to host. Reported ms is
(program wall time − small-iter program wall time) / (ITERS − 1), which
cancels dispatch/tunnel overhead.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 18
m = 1 << 19
F = 2
C = 8
w = C * F
L = 16
ITERS = 8

key = jax.random.PRNGKey(0)


def chain_time(name, make_fn, *args):
    """make_fn(iters) -> jitted fn(args..., key) returning a scalar."""
    f_many = make_fn(ITERS)
    f_one = make_fn(1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # compile + warm both
    float(np.asarray(f_many(*args, k1)))
    float(np.asarray(f_one(*args, k2)))
    t0 = time.perf_counter()
    float(np.asarray(f_one(*args, k3)))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(f_many(*args, k4)))
    t_many = time.perf_counter() - t0
    per = (t_many - t_one) / (ITERS - 1)
    print(f"{name:44s} {per*1e3:8.2f} ms  (1-iter {t_one*1e3:6.1f} ms)", flush=True)
    return per


# device-resident buffers shared by probes
table_n = jax.device_put(np.random.default_rng(0).uniform(size=(m, F)).astype(np.float32))
table_f = jax.device_put(np.random.default_rng(0).uniform(size=(m * F,)).astype(np.float32))
B16 = jax.device_put(np.random.default_rng(1).uniform(size=(m, w)).astype(np.float32))
Bp = jax.device_put(np.random.default_rng(1).uniform(size=(m // 8, 128)).astype(np.float32))
Bp16 = jax.device_put(np.asarray(np.random.default_rng(1).uniform(size=(m // 8, 128)), np.float32).astype(np.dtype("bfloat16")))
idx0 = jax.device_put(np.random.default_rng(2).integers(0, m, size=(N,)).astype(np.int32))
G16 = jax.device_put(np.random.default_rng(3).uniform(size=(N + 1, w)).astype(np.float32))
G128 = jax.device_put(np.random.default_rng(3).uniform(size=(N + 1, 128)).astype(np.float32))
IDXL = jax.device_put(np.random.default_rng(4).integers(0, m, size=(L, N)).astype(np.int32))


def mk_roll_narrow(iters):
    shifts = (1, 513, 77777, 262145, 3, 1027, 55555, 131073)

    @jax.jit
    def f(t, k):
        def body(i, c):
            tt = t + c * 1e-30
            acc = c
            for s in shifts:
                acc = acc + jnp.roll(tt, -s, axis=0).sum() % 32.0
            return acc

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_roll_flat(iters):
    shifts = (1, 513, 77777, 262145, 3, 1027, 55555, 131073)

    @jax.jit
    def f(t, k):
        def body(i, c):
            tt = t + c * 1e-30
            acc = c
            for s in shifts:
                acc = acc + jnp.roll(tt, -F * s).sum() % 32.0
            return acc

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_gather16(iters):
    @jax.jit
    def f(B, idx, k):
        def body(i, c):
            ii = (idx + c.astype(jnp.int32)) & (m - 1)
            ii = jax.lax.optimization_barrier(ii)
            return jnp.take(B, ii, axis=0).sum() % 1024.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_gather_packed(iters, dtype_tag):
    @jax.jit
    def f(Bp, idx, k):
        def body(i, c):
            ii = (idx + c.astype(jnp.int32)) & (m - 1)
            ii = jax.lax.optimization_barrier(ii)
            rows = jnp.take(Bp, ii >> 3, axis=0)  # [N, 128]
            j = (ii & 7)[:, None]
            out = jnp.zeros((N, 16), jnp.float32)
            for kk in range(8):
                out = out + jnp.where(j == kk, 1.0, 0.0) * rows[:, 16 * kk : 16 * (kk + 1)].astype(jnp.float32)
            return out.sum() % 1024.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_cumsum(iters, width):
    @jax.jit
    def f(G, k):
        def body(i, c):
            g = G[: N, :width] + c * 1e-30
            return jnp.cumsum(g, axis=0).sum() % 32.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, ()))

    return f


def mk_bgather(iters, nb, width):
    @jax.jit
    def f(G, idx, k):
        def body(i, c):
            b = (idx[: nb % N] if nb <= N else jnp.concatenate([idx] * (nb // N + 1))[:nb])
            b = (b % N + c.astype(jnp.int32)) % N
            b = jax.lax.optimization_barrier(b)
            return jnp.take(G[:, :width], b, axis=0).sum() % 1024.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_hist(iters, bins):
    from nerfshop_tpu.ops import table_ops

    @jax.jit
    def f(idx, k):
        def body(i, c):
            ii = (idx + c.astype(jnp.int32)) % bins
            ii = jax.lax.optimization_barrier(ii)
            h = table_ops.exact_histogram(ii, bins)
            iot = jax.lax.broadcasted_iota(jnp.float32, (bins, 1), 0)[:, 0]
            return (h * iot).sum() % 32.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_sort(iters):
    @jax.jit
    def f(idxl, k):
        def body(i, c):
            ii = (idxl + c.astype(jnp.int32)) & (m - 1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (L, N), 1)
            si, perm = jax.lax.sort_key_val(ii, iota, dimension=1)
            # position-weighted sums: cannot be reduced to unsorted sums
            return ((si * iota).sum() + (perm * iota).sum()).astype(jnp.float32) % 7.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


def mk_segment_grad_current(iters):
    from nerfshop_tpu.ops import table_ops
    sizes = [m] * L

    @jax.jit
    def f(idxl, g, k):
        def body(i, c):
            ii = (idxl + c.astype(jnp.int32)) & (m - 1)
            gg = jnp.broadcast_to(g[:N, :w], (L, N, w)) + c * 1e-30
            outs = table_ops.segment_table_grad(ii, gg, sizes)
            return sum(o.sum() for o in outs) % 7.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jax.random.uniform(k, (), minval=1.0, maxval=2.0))

    return f


print("== narrow vs flat/packed layouts (per-op ms, in-program chained) ==")
chain_time("roll x8 [m,2] axis0", mk_roll_narrow, table_n)
chain_time("roll x8 flat [2m]", mk_roll_flat, table_f)
chain_time("gather 2^18 rows [m,16]", mk_gather16, B16, idx0)
chain_time("gather 2^18 rows packed f32 [m/8,128]", lambda it: mk_gather_packed(it, "f32"), Bp, idx0)
chain_time("gather 2^18 rows packed bf16", lambda it: mk_gather_packed(it, "bf16"), Bp16, idx0)
chain_time("cumsum [N,16]", lambda it: mk_cumsum(it, 16), G16)
chain_time("cumsum [N,128]", lambda it: mk_cumsum(it, 128), G128)
chain_time("boundary gather [m+1]x16w", lambda it: mk_bgather(it, m + 1, 16), G16, idx0)
chain_time("boundary gather [m/8+1]x128w", lambda it: mk_bgather(it, m // 8 + 1, 128), G128, idx0)
chain_time("histogram m bins", lambda it: mk_hist(it, m), idx0)
chain_time("histogram m/8 bins", lambda it: mk_hist(it, m // 8), idx0)
chain_time("sort [16,N] keyval", mk_sort, IDXL)
chain_time("segment_table_grad x16 (current)", mk_segment_grad_current, IDXL, G16)
