"""Scatter-free feature-table gradients (the TPU answer to tcnn's
hash-table atomicAdd backward, SURVEY hard-part #2).

XLA's scatter-add on TPU executes serially (~12 M rows/s measured on v5e —
80 ns/row regardless of unique/sorted hints), which made the reference-style
encoding backward the dominant train-step cost. This module computes EXACT
per-row gradient sums with zero scatters, using only primitives that run at
vector/matrix speed:

1. sort the sample→row indices (batched bitonic ``lax.sort``: ~400 M keys/s)
2. permutation-gather the cotangent rows into sorted order (one row-gather)
3. inclusive prefix sum over the sorted rows (dense VPU)
4. per-row segment boundaries from an index histogram — computed EXACTLY on
   the MXU as a radix-128 one-hot matmul (counts ≤ 2^24 are exact in f32
   accumulation), then an exclusive cumsum
5. dT[i] = cumsum[end_i] − cumsum[start_i] — two row-gathers

Cost model per level (N samples, m table rows): sort N + gather N rows +
histogram matmul (N·m·2 flops) + 2·m boundary-gather rows — versus N/12.6M
seconds for the scatter it replaces (≈10× at N=2^18, m=2^17).

Numerical note: step 5 differences two f32 prefix sums; relative error is
~1e-7·(prefix magnitude / segment magnitude). For SGD-scale gradient noise
this is far below significance (validated against the exact scatter in
tests/test_table_ops.py).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def exact_histogram(idx: jnp.ndarray, m: int) -> jnp.ndarray:
    """Histogram of ``idx`` [N] int32 ∈ [0, m) over ``m`` bins (m % 128 == 0),
    computed as a radix-128 one-hot matmul on the MXU. Exact for N < 2^24."""
    assert m % 128 == 0, m
    H = m // 128
    hi = (idx >> 7).astype(jnp.int32)
    lo = (idx & 127).astype(jnp.int32)
    A = (hi[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)).astype(jnp.bfloat16)
    B = (lo[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)).astype(jnp.bfloat16)
    counts = jax.lax.dot_general(
        A, B, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [H, 128]
    return counts.reshape(m)


def segment_table_grad(
    idx: jnp.ndarray,  # [L, N] int32, per-level row indices ∈ [0, m_l)
    g: jnp.ndarray,  # [L, N, w] f32 cotangent rows
    level_sizes: Sequence[int],  # m_l, each % 128 == 0
) -> list:
    """→ [dT_0 [m_0, w], …]: exact per-row sums Σ_{n: idx[l,n]=i} g[l,n]
    without any scatter. All levels share one batched sort/cumsum."""
    L, N = idx.shape
    w = g.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (L, N), 1)
    si, perm = jax.lax.sort_key_val(idx, iota, dimension=1)

    # barriers below keep XLA from fusing big-operand slices/pads INTO the
    # gathers: the fused forms run ~65-100 M rows/s vs ~250 M+ rows/s for
    # gathers from materialized buffers (v5e measurement; was 60% of the
    # whole train step before the barriers)
    g = jax.lax.optimization_barrier(g)
    perm = jax.lax.optimization_barrier(perm)
    grads = []
    for l, m in enumerate(level_sizes):
        gs = jnp.take(g[l], perm[l], axis=0)  # [N, w]
        cs_ext = jnp.concatenate([jnp.zeros((1, w), gs.dtype), jnp.cumsum(gs, axis=0)])
        counts = exact_histogram(idx[l], m)
        # segment boundaries: end_i = start_{i+1}, so ONE gather at the m+1
        # boundary points + adjacent diff replaces separate start/end gathers
        b = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)])
        b = b.astype(jnp.int32)  # [m+1]
        # barriers keep XLA from fusing the pad(cs_ext) INTO the gather —
        # the fused pad+gather kernel runs ~65 M rows/s vs ~>1 G rows/s for
        # a gather from a materialized buffer (measured v5e: the fused form
        # cost ~18 ms/level, the barriered form ~0.15 ms/level)
        cs_ext = jax.lax.optimization_barrier(cs_ext)
        b = jax.lax.optimization_barrier(b)
        cb = jnp.take(cs_ext, b, axis=0)  # [m+1, w]
        grads.append(cb[1:] - cb[:-1])
    return grads


def make_level_gather(level_sizes: Sequence[int], row_width: int, force_segment: bool = False):
    """Factory: per-level row gather with the scatter-free backward.

    Returns ``gather(tables [list of [m_l, w]], idx [L, N]) → [L, N, w]``.
    The forward gathers from each level's table SEPARATELY — measured on
    v5e, XLA row-gather throughput falls off sharply with operand footprint
    (~260 M rows/s at ≤8 MB, ~40 M rows/s at 350 MB — small tables appear to
    be served from on-chip memory), so one fused flat-table gather is ~7×
    slower than L small ones. Backward batches the sort/cumsum across levels
    (:func:`segment_table_grad`) but keeps per-level row ops small too.
    """
    level_sizes = tuple(int(m) for m in level_sizes)

    if jax.default_backend() == "cpu" and not force_segment:
        # XLA:CPU scatters at memory speed — autodiff's native scatter-add
        # backward beats the sort pipeline there (which exists to dodge the
        # TPU's ~12 M rows/s serial scatter). Keeps CPU tests fast.
        def gather_cpu(tables, idx):
            return jnp.stack([jnp.take(t, idx[l], axis=0) for l, t in enumerate(tables)])

        return gather_cpu

    @jax.custom_vjp
    def gather(tables, idx):
        outs = [jnp.take(t, idx[l], axis=0) for l, t in enumerate(tables)]
        return jnp.stack(outs)

    def fwd(tables, idx):
        return gather(tables, idx), idx

    def bwd(idx, ct):
        grads = segment_table_grad(idx, ct.astype(jnp.float32), level_sizes)
        return grads, None

    gather.defvjp(fwd, bwd)
    return gather
