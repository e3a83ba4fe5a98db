"""Narrow-row gather rates: can hashed levels gather their CANONICAL [m, F]
rows (4 MB at F=2 — small enough for XLA to stage in VMEM?) faster than the
[m, 16] brick rows?  probe_gather_landscape saw [65536, 32] at 3.5 G rows/s
(VMEM class) while every [2^19, w>=16] was 28-198 M (HBM class).
take [m, w] for w in {2, 4, 8, 16} at m = 2^19, plus m = 2^21 w=2
(threshold check).  N = 2^17 rows per take, indices re-derived per
iteration from the consumed output so nothing memoizes."""
import time
import jax, jax.numpy as jnp, numpy as np

N = 1 << 17


def timed(label, m, w, iters=12):
    table = jax.random.uniform(jax.random.PRNGKey(0), (m, w))
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, m)

    def chain(iters):
        @jax.jit
        def run(table, idx0):
            def body(i, carry):
                idx, acc = carry
                out = jnp.take(table, idx, axis=0)  # [N, w]
                s = jnp.sum(out)
                # derive next indices FROM the output: forces serialization
                # and defeats memoization without changing the distribution
                idx2 = (idx + (out[:, 0] * 1e6).astype(jnp.int32)) % m
                return idx2, acc + s % 7.0

            idx, acc = jax.lax.fori_loop(0, iters, body, (idx0, jnp.zeros(())))
            return acc + jnp.sum(idx % 13)

        return run

    c1, cK = chain(1), chain(iters)
    float(np.asarray(c1(table, idx0)))
    float(np.asarray(cK(table, idx0)))
    t0 = time.perf_counter(); float(np.asarray(c1(table, idx0))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(cK(table, idx0))); tK = time.perf_counter() - t0
    dt = (tK - t1) / (iters - 1)
    print(f"{label:30s} {dt*1e3:8.3f} ms  ({N/dt/1e6:8.1f} M rows/s)", flush=True)


for w in (2, 4, 8, 16):
    timed(f"take [2^19,{w}]", 1 << 19, w)
timed("take [2^21,2]", 1 << 21, 2)
