import time, jax, jax.numpy as jnp, numpy as np

def bench(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

R, M, K = 1 << 14, 1024, 32
C = 5
Rg = 128
ncell = C * Rg**3

key = jax.random.PRNGKey(0)
flat_idx = jax.random.randint(key, (R, M), 0, ncell, jnp.int32)

occ_bool = jax.random.uniform(jax.random.PRNGKey(1), (ncell,)) < 0.1
occ_u8 = occ_bool.astype(jnp.uint8)
packed = jnp.asarray(np.packbits(np.asarray(occ_bool)).view(np.uint32), dtype=jnp.uint32)  # [ncell/32]

# gather from bool [10M]
f1 = jax.jit(lambda idx: jnp.take(occ_bool, idx, axis=0))
print(f"gather bool[10M]   [R,M]: {bench(f1, flat_idx)*1e3:7.3f} ms")
f1b = jax.jit(lambda idx: jnp.take(occ_u8, idx, axis=0))
print(f"gather u8[10M]     [R,M]: {bench(f1b, flat_idx)*1e3:7.3f} ms")

# gather from packed words [327K words = 1.3MB]
def packed_lookup(idx):
    word = jnp.take(packed, idx >> 5, axis=0)
    return (word >> (idx.astype(jnp.uint32) & 31)) & 1
f2 = jax.jit(packed_lookup)
print(f"gather packed[1.3MB] [R,M]: {bench(f2, flat_idx)*1e3:7.3f} ms")

# one-cascade packed (262KB/8 = 65KB words... 128^3/32 = 65536 words = 262KB)
packed1 = packed[:Rg**3 // 32]
idx1 = flat_idx % (Rg**3)
def packed_lookup1(idx):
    word = jnp.take(packed1, idx >> 5, axis=0)
    return (word >> (idx.astype(jnp.uint32) & 31)) & 1
f3 = jax.jit(packed_lookup1)
print(f"gather packed[262KB] [R,M]: {bench(f3, idx1)*1e3:7.3f} ms")

# cumsum along M
x = jax.random.uniform(jax.random.PRNGKey(2), (R, M))
f4 = jax.jit(lambda x: jnp.cumsum(x, axis=1))
print(f"cumsum [R,M]:            {bench(f4, x)*1e3:7.3f} ms")

# top_k
f5 = jax.jit(lambda x: jax.lax.top_k(x, K))
print(f"top_k  [R,M]->K:         {bench(f5, x)*1e3:7.3f} ms")

# binary search compaction: ranks=cumsum(occ); for k in 1..K find first m with rank>=k via searchsorted
occ2 = jax.random.uniform(jax.random.PRNGKey(3), (R, M)) < 0.1
def bsearch_compact(occ):
    ranks = jnp.cumsum(occ.astype(jnp.int32), axis=1)  # [R,M] monotone
    targets = jnp.arange(1, K + 1, dtype=jnp.int32)
    # vectorized binary search: lo/hi per (r,k)
    lo = jnp.zeros((R, K), jnp.int32)
    hi = jnp.full((R, K), M, jnp.int32)
    for _ in range(int(np.ceil(np.log2(M)))):
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(ranks, mid, axis=1)
        go_right = v < targets[None, :]
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo  # first m with rank >= k+1
f6 = jax.jit(bsearch_compact)
print(f"bsearch compact [R,M]->K:{bench(f6, occ2)*1e3:7.3f} ms")

# gather-heavy: take_along_axis [R,M] by [R,K]
idxk = jax.random.randint(jax.random.PRNGKey(4), (R, K), 0, M, jnp.int32)
f7 = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1))
print(f"take_along [R,M] by[R,K]:{bench(f7, x, idxk)*1e3:7.3f} ms")

# full march one-shot estimate: ladder math + packed gather + cumsum + bsearch
def march_proto(o, d):
    t0 = jnp.zeros((R,)) + 0.05
    m = jnp.arange(M, dtype=jnp.float32)[None, :]
    T = t0[:, None] + m * (3**0.5/1024)
    px = o[:, 0:1] + T * d[:, 0:1]; py = o[:, 1:2] + T * d[:, 1:2]; pz = o[:, 2:3] + T * d[:, 2:3]
    ix = jnp.clip((px * Rg).astype(jnp.int32), 0, Rg-1)
    iy = jnp.clip((py * Rg).astype(jnp.int32), 0, Rg-1)
    iz = jnp.clip((pz * Rg).astype(jnp.int32), 0, Rg-1)
    flat = (ix * Rg + iy) * Rg + iz
    flat = jax.lax.optimization_barrier(flat)
    word = jnp.take(packed1, flat >> 5, axis=0)
    occ = ((word >> (flat.astype(jnp.uint32) & 31)) & 1).astype(jnp.bool_)
    ranks = jnp.cumsum(occ.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, K + 1, dtype=jnp.int32)
    lo = jnp.zeros((R, K), jnp.int32); hi = jnp.full((R, K), M, jnp.int32)
    for _ in range(10):
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(ranks, mid, axis=1)
        go_right = v < targets[None, :]
        lo = jnp.where(go_right, mid + 1, lo); hi = jnp.where(go_right, hi, mid)
    out_t = jnp.take_along_axis(T, jnp.minimum(lo, M-1), axis=1)
    return out_t
o = jax.random.uniform(jax.random.PRNGKey(5), (R, 3))
d = jax.random.normal(jax.random.PRNGKey(6), (R, 3))
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
f8 = jax.jit(march_proto)
print(f"march proto [R=2^14,M=1024]->K=32: {bench(f8, o, d)*1e3:7.3f} ms")
