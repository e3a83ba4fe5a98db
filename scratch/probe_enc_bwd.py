"""Per-op timing of the brick-encoding backward path on chip.

Every timed program takes a fresh rng key so the relay's memoization can't
serve cached executions.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.config import default_nerf_config
from nerfshop_tpu.models.nerf_network import build_nerf_network
from nerfshop_tpu.ops import table_ops

model = build_nerf_network(default_nerf_config(), aabb_scale=1)
enc = model.pos_encoding
params = model.init(jax.random.PRNGKey(0))
table = params["pos_encoding"]["table"]
print("table", table.shape, "levels", enc.level_sizes)

N = 1 << 18
L = enc.n_levels
C = 1 << enc.n_input_dims
F = enc.n_features_per_level
w = C * F
lvl_sizes = enc.level_sizes
key = jax.random.PRNGKey(1)
keys = [jax.random.fold_in(key, i) for i in range(64)]


def timeit(name, fn, n=8):
    # NOTE: all n calls dispatch async and block once at the end — per-op ms
    # is pipelined THROUGHPUT, not latency; compare ops against each other
    # here, not against profile_train's dependency-chained full-step number.
    for i in range(2):
        jax.block_until_ready(fn(keys[i]))
    outs = []
    t0 = time.perf_counter()
    for i in range(n):
        outs.append(fn(keys[i + 2]))
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def mk_idx(rng):
    return jnp.stack(
        [jax.random.randint(jax.random.fold_in(rng, l), (N,), 0, m) for l, m in enumerate(lvl_sizes)]
    )


# 1. batched sort of [L, N] keys + iota payload
@jax.jit
def p_sort(rng):
    idx = mk_idx(rng)
    iota = jax.lax.broadcasted_iota(jnp.int32, (L, N), 1)
    si, perm = jax.lax.sort_key_val(idx, iota, dimension=1)
    return si.sum() + perm.sum()

timeit("sort [L,N]", p_sort)


# 2. permutation gathers: L gathers of N rows x w from [N, w]
@jax.jit
def p_gather(rng):
    g = jax.random.uniform(rng, (L, N, w))
    perm = jnp.stack([jax.random.permutation(jax.random.fold_in(rng, l), N) for l in range(L)])
    g = jax.lax.optimization_barrier(g)
    perm = jax.lax.optimization_barrier(perm)
    acc = 0.0
    for l in range(L):
        acc = acc + jnp.take(g[l], perm[l], axis=0).sum()
    return acc

timeit("perm gathers x16 [N,w]", p_gather)


# 3. cumsums: L cumsums over [N, w]
@jax.jit
def p_cumsum(rng):
    g = jax.random.uniform(rng, (L, N, w))
    acc = 0.0
    for l in range(L):
        acc = acc + jnp.cumsum(g[l], axis=0)[-1].sum()
    return acc

timeit("cumsum x16 [N,w]", p_cumsum)


# 3b. ONE batched cumsum over [L, N, w]
@jax.jit
def p_cumsum_b(rng):
    g = jax.random.uniform(rng, (L, N, w))
    return jnp.cumsum(g, axis=1)[:, -1].sum()

timeit("cumsum batched [L,N,w]", p_cumsum_b)


# 4. exact histograms x16
@jax.jit
def p_hist(rng):
    idx = mk_idx(rng)
    return sum(table_ops.exact_histogram(idx[l], m).sum() for l, m in enumerate(lvl_sizes))

timeit("exact_histogram x16", p_hist)


# 5. boundary gathers: per level gather [m+1] rows x w from [N+1, w]
@jax.jit
def p_bgather(rng):
    cs = jax.random.uniform(rng, (N + 1, w))
    cs = jax.lax.optimization_barrier(cs)
    acc = 0.0
    for l, m in enumerate(lvl_sizes):
        b = jax.random.randint(jax.random.fold_in(rng, l), (m + 1,), 0, N)
        b = jax.lax.optimization_barrier(b)
        acc = acc + jnp.take(cs, b, axis=0).sum()
    return acc

timeit("boundary gathers x16", p_bgather)


# 6. full segment_table_grad
@jax.jit
def p_seg(rng):
    idx = mk_idx(rng)
    g = jax.random.uniform(jax.random.fold_in(rng, 99), (L, N, w))
    outs = table_ops.segment_table_grad(idx, g, lvl_sizes)
    return sum(o.sum() for o in outs)

timeit("segment_table_grad", p_seg)


# 7. brick build via roll (current)
@jax.jit
def p_brick_roll(t, rng):
    t = t + 1e-30 * jax.random.uniform(rng, ())
    return [b.sum() for b in enc._brick_tables(t)]

timeit("brick build (roll)", lambda i: p_brick_roll(table, keys[i])[0])


# 8. brick build via double-table + static slice
@jax.jit
def p_brick_slice(t, rng):
    t = t + 1e-30 * jax.random.uniform(rng, ())
    outs = []
    for l in range(enc.n_levels):
        Tl = t[enc.level_offsets[l] : enc.level_offsets[l + 1]]
        m = enc.level_sizes[l]
        T2 = jnp.concatenate([Tl, Tl], axis=0)
        cols = [jax.lax.slice(T2, (s, 0), (s + m, F)) for s in enc._brick_shifts[l]]
        outs.append(jnp.concatenate(cols, axis=1))
    return [b.sum() for b in outs]

timeit("brick build (slice2x)", lambda i: p_brick_slice(table, keys[i])[0])


# 9. brick build via gather of rows
@jax.jit
def p_brick_gather(t, rng):
    t = t + 1e-30 * jax.random.uniform(rng, ())
    outs = []
    for l in range(enc.n_levels):
        Tl = t[enc.level_offsets[l] : enc.level_offsets[l + 1]]
        m = enc.level_sizes[l]
        ar = jnp.arange(m, dtype=jnp.int32)
        cols = [jnp.take(Tl, (ar + s) % m, axis=0) for s in enc._brick_shifts[l]]
        outs.append(jnp.concatenate(cols, axis=1))
    return [b.sum() for b in outs]

timeit("brick build (gather)", lambda i: p_brick_gather(table, keys[i])[0])


# 10. vjp of the roll-based brick build (the backward reduction)
@jax.jit
def p_brick_vjp(t, rng):
    t = t + 1e-30 * jax.random.uniform(rng, ())
    _, vjp = jax.vjp(enc._brick_tables, t)
    cts = [jnp.ones((enc.level_sizes[l], w), jnp.float32) for l in range(enc.n_levels)]
    (dt_,) = vjp(cts)
    return dt_.sum()

timeit("brick vjp (roll bwd)", lambda i: p_brick_vjp(table, keys[i]))


# 11. einsum backward shape: [L,N,C]x[L,N,C,F] products
@jax.jit
def p_einsum_bwd(rng):
    wgt = jax.random.uniform(rng, (L, N, C))
    feats = jax.random.uniform(jax.random.fold_in(rng, 1), (L, N, C, F))
    def f(wgt, feats):
        return jnp.einsum("lnc,lncf->lnf", wgt, feats).sum()
    # keep BOTH grad outputs live so neither backward matmul is DCE'd
    return sum(l.sum() for l in jax.tree.leaves(jax.grad(f, argnums=(0, 1))(wgt, feats)))

timeit("einsum lncf bwd", p_einsum_bwd)
