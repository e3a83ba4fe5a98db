"""Honest (dependency-chained) gather/scatter throughput probe.

The serving runtime memoizes repeated identical executions, so every
measurement here chains: iteration t+1's indices derive from iteration t's
gathered values. Measures:
  1. XLA row-gather from [T, F] tables, F in {2, 8, 128}, T in {2^14, 2^19}
  2. XLA per-lane gather (take_along_axis axis=0) on [S, 128]
  3. Backward: scatter-add (VJP of the above) chained
"""
import time, jax, jax.numpy as jnp, numpy as np


def bench_chain(step, state, iters=8, warmup=2):
    for _ in range(warmup):
        state = step(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters


def probe_row_gather(T, F, N):
    tab = jax.random.normal(jax.random.PRNGKey(0), (T, F), jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    @jax.jit
    def step(idx):
        rows = jnp.take(tab, idx, axis=0)          # [N, F]
        h = (rows[:, 0] * 1e4).astype(jnp.int32)    # depends on gathered data
        return (idx * 1664525 + h + 1013904223) & (T - 1)

    dt = bench_chain(step, idx0)
    print(f"row-gather T=2^{int(np.log2(T))} F={F:3d} N=2^{int(np.log2(N))}: "
          f"{dt*1e3:8.3f} ms  {N/dt/1e9:7.2f} G rows/s  {N*F*4/dt/1e9:7.1f} GB/s")


def probe_lane_gather(S, N_rows):
    tab = jax.random.normal(jax.random.PRNGKey(0), (S, 128), jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N_rows, 128), 0, S, jnp.int32)

    @jax.jit
    def step(idx):
        g = jnp.take_along_axis(tab, idx, axis=0)   # [N_rows, 128]
        h = (g * 1e4).astype(jnp.int32)
        return (idx * 1664525 + h + 1013904223) % S

    dt = bench_chain(step, idx0)
    n = N_rows * 128
    print(f"lane-gather S=2^{int(np.log2(S))} rows=2^{int(np.log2(N_rows))}: "
          f"{dt*1e3:8.3f} ms  {n/dt/1e9:7.2f} G lookups/s")


def probe_row_scatter(T, F, N):
    tab = jax.random.normal(jax.random.PRNGKey(0), (T, F), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (N, F), jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    def loss(tab, idx):
        rows = jnp.take(tab, idx, axis=0)
        return jnp.sum(rows * g)

    grad = jax.grad(loss)

    @jax.jit
    def step(idx):
        d = grad(tab, idx)                          # scatter-add [N,F] -> [T,F]
        h = (d[0, 0] * 1e4).astype(jnp.int32)
        return (idx * 1664525 + h + 1013904223) & (T - 1)

    dt = bench_chain(step, idx0)
    print(f"row-scatter(vjp) T=2^{int(np.log2(T))} F={F:3d} N=2^{int(np.log2(N))}: "
          f"{dt*1e3:8.3f} ms  {N/dt/1e9:7.2f} G rows/s")


def probe_lane_scatter(S, N_rows):
    tab = jnp.zeros((S, 128), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (N_rows, 128), jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N_rows, 128), 0, S, jnp.int32)

    def loss(tab, idx):
        gr = jnp.take_along_axis(tab, idx, axis=0)
        return jnp.sum(gr * g)

    grad = jax.grad(loss)

    @jax.jit
    def step(idx):
        d = grad(tab, idx)
        h = (d[0, 0] * 1e4).astype(jnp.int32)
        return (idx * 1664525 + h + 1013904223) % S

    dt = bench_chain(step, idx0)
    n = N_rows * 128
    print(f"lane-scatter(vjp) S=2^{int(np.log2(S))} rows=2^{int(np.log2(N_rows))}: "
          f"{dt*1e3:8.3f} ms  {n/dt/1e9:7.2f} G adds/s")


if __name__ == "__main__":
    N = 1 << 21
    for T in (1 << 14, 1 << 19):
        for F in (2, 8, 128):
            probe_row_gather(T, F, N if F <= 8 else N // 8)
    for S in (1 << 12, 1 << 15, 1 << 17):
        probe_lane_gather(S, 1 << 14)
    print("--- backward ---")
    for T in (1 << 14, 1 << 19):
        probe_row_scatter(T, 2, 1 << 21)
    probe_row_scatter(1 << 19, 8, 1 << 21)
    for S in (1 << 12, 1 << 15, 1 << 17):
        probe_lane_scatter(S, 1 << 14)
