"""VERDICT r3 #3: can sorting sample slot-indices make the FORWARD
hash-table gathers run at memory speed?

Forms, per level (brick table [m, 16] — default config: F=2, D=3 ⇒ w=16):
  A  random row-gather (current forward, table_ops._forward_feats)
  B  sort(idx) → MONOTONE gather → unsort features (2nd sort for inv perm)
  B2 sort(idx) → monotone gather → unsort via ONE scatter (row-scatter of
     [N,16] rows at sorted positions → original positions)
  E  A but from a bf16 table (halved operand footprint)
  BE B from a bf16 table

All timings are IN-PROGRAM dependency chains (lax.fori_loop, iteration t+1's
indices derive from t's gathered values), t(K)−t(1) differenced — the relay
memoizes repeated identical executions and adds ~30 ms fixed per dispatch.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 18
W = 16
K_ITERS = 16


def chain(body_fn, idx0, extra, iters):
    @jax.jit
    def run(idx0, extra):
        def body(i, carry):
            idx, acc = carry
            out, nxt = body_fn(idx, extra)
            return nxt, acc + jnp.sum(out[:128, 0])

        idx, acc = jax.lax.fori_loop(0, iters, body, (idx0, jnp.zeros((), jnp.float32)))
        return idx[0] + acc.astype(jnp.int32)

    return run


def bench(body_fn, idx0, extra):
    c1 = chain(body_fn, idx0, extra, 1)
    cK = chain(body_fn, idx0, extra, K_ITERS)
    float(np.asarray(c1(idx0, extra)))
    float(np.asarray(cK(idx0, extra)))
    idx1 = (idx0 * 7 + 13) % extra[0].shape[0]
    t0 = time.perf_counter()
    float(np.asarray(c1(idx1, extra)))
    t1 = time.perf_counter() - t0
    idx2 = (idx0 * 11 + 5) % extra[0].shape[0]
    t0 = time.perf_counter()
    float(np.asarray(cK(idx2, extra)))
    tK = time.perf_counter() - t0
    return (tK - t1) / (K_ITERS - 1)


def next_idx(idx, rows, m):
    h = (rows[:, 0] * 1e4).astype(jnp.int32)
    return (idx * 1664525 + h + 1013904223) % m


def form_A(idx, extra):
    (tab,) = extra
    m = tab.shape[0]
    rows = jnp.take(tab, idx, axis=0)
    return rows.astype(jnp.float32), next_idx(idx, rows.astype(jnp.float32), m)


def form_B(idx, extra):
    (tab,) = extra
    m = tab.shape[0]
    iota = jax.lax.iota(jnp.int32, idx.shape[0])
    si, perm = jax.lax.sort_key_val(idx, iota)
    rows_s = jnp.take(tab, si, axis=0)  # monotone
    rows_s = jax.lax.optimization_barrier(rows_s)
    _, inv = jax.lax.sort_key_val(perm, iota)  # inverse permutation
    rows = jnp.take(rows_s, inv, axis=0)  # unsort: random gather, small operand
    return rows.astype(jnp.float32), next_idx(idx, rows.astype(jnp.float32), m)


def form_B2(idx, extra):
    (tab,) = extra
    m = tab.shape[0]
    iota = jax.lax.iota(jnp.int32, idx.shape[0])
    si, perm = jax.lax.sort_key_val(idx, iota)
    rows_s = jnp.take(tab, si, axis=0)
    rows_s = jax.lax.optimization_barrier(rows_s)
    rows = jnp.zeros_like(rows_s).at[perm].set(rows_s)  # row scatter
    return rows.astype(jnp.float32), next_idx(idx, rows.astype(jnp.float32), m)


def main():
    key = jax.random.PRNGKey(0)
    for m_log in (15, 17, 19, 21):
        m = 1 << m_log
        tab = jax.random.normal(key, (m, W), jnp.float32)
        tab_bf = tab.astype(jnp.bfloat16)
        idx0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, m, jnp.int32)
        for name, fn, t in (
            ("A  rand-gather f32 ", form_A, tab),
            ("E  rand-gather bf16", form_A, tab_bf),
            ("B  sorted+unsort f32", form_B, tab),
            ("BE sorted+unsort bf16", form_B, tab_bf),
            ("B2 sorted+scatter f32", form_B2, tab),
        ):
            dt = bench(fn, idx0, (t,))
            print(
                f"m=2^{m_log} {name}: {dt*1e3:7.3f} ms  "
                f"{N/dt/1e6:7.1f} M rows/s  {N*W*t.dtype.itemsize/dt/1e9:6.1f} GB/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
