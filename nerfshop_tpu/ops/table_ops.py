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

import os
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

#: default for make_brick_encode(use_pallas=None), read at TRACE time so
#: probes/tests can A/B the backward without rebuilding the model.
#: MEASURED (v5e, scratch/probe_segsum_tpu.py, 2^18 samples × 16 levels):
#: the Pallas block-matmul segsum (ops/pallas_segsum.py) runs the isolated
#: enc fwd+bwd chain at 665 ms vs 2.45 ms for this XLA pipeline (the
#: rb=16-row DMA subchunks are latency-bound and the per-block one-hot
#: construction swamps the MXU win); full train step 697 vs 130 ms. The
#: kernel + tests stay as the recorded negative result — default OFF.
USE_PALLAS = False


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


def corner_offsets(n_input_dims: int) -> np.ndarray:
    """[2^D, D] binary corner offsets (corner c has bit d = (c>>d)&1)."""
    D = n_input_dims
    return np.stack(
        [[(c >> d) & 1 for d in range(D)] for c in range(1 << D)]
    ).astype(np.int32)


def corner_products(w1: jnp.ndarray) -> jnp.ndarray:
    """Folded per-axis lerp fractions w1 [..., D] → corner weights [..., 2^D]
    (w8_c = Π_d (w1_d if corner bit set else 1−w1_d))."""
    D = w1.shape[-1]
    offs = jnp.asarray(corner_offsets(D), w1.dtype)  # [C, D]
    return jnp.prod(
        jnp.where(offs == 1, w1[..., None, :], 1.0 - w1[..., None, :]), axis=-1
    )


def make_brick_encode(
    level_sizes: Sequence[int],
    level_offsets: Sequence[int],
    level_shifts: Sequence[Sequence[int]],
    n_features: int,
    n_input_dims: int,
    *,
    force_segment: bool = False,
    matmul_max: int = 0,
    use_pallas: bool | None = None,
):
    """The fused brick-layout grid-encode op with a TPU-native backward.

    Returns ``encode(table [Σm, F], idx [L, N], w8 [L, N, 2^D], w1 [L, N, D])
    → [L, N, F]`` where ``idx`` is the per-level base slot of the sample's
    cell and ``w8 == corner_products(w1)`` (the caller guarantees this; the
    gradient flows through ``w8`` only, ``w1`` is the COMPACT representation
    the backward carries through its sort instead of 2^D·F-wide cotangent
    rows).

    Forward: the canonical table is re-laid per level into a PACKED brick
    table ``[m/P, 128]`` (P = 128/(2^D·F) logical rows per 128-lane physical
    row; corner c of logical row i lives at lanes [(i%P)·w + c·F, …+F) of
    physical row i//P — built from cheap axis-0 rolls of the [m, F] slice).
    One row-gather per level per sample fetches all corners; a P-way lane
    select extracts the logical row. 128-lane rows are the unit the HBM
    gather path actually transfers, so the narrow-row padding tax vanishes.

    Backward (d_table), per level:
    * small levels (m ≤ matmul_max): EXACT one-hot matmul on the MXU,
      dBrick = Aᵀ·ct with A [N, m] built on the fly (fused into the matmul
      like exact_histogram) and ct split into two bf16 terms (hi + residual)
      so the f32 cotangent is represented exactly to ~2⁻¹⁶. Disabled by
      default (matmul_max=0): the [m, C·F]-shaped output keeps the MXU at
      ~10% utilization (measured 20 ms for levels 4k/12k/30k on v5e), while
      these levels ride the batched sort below almost for free.
    * large levels: ONE batched sort of (idx | w1, dout) — 6 narrow operands
      instead of a permutation-gather of [N, 2^D·F] rows (random row-gathers
      run ~4e7 rows/s on v5e; the bitonic sort network is dense/VPU) — then
      rebuild ct in sorted order, prefix-sum, histogram boundaries
      (exact_histogram), and a MONOTONE boundary gather (memory-speed).
    Corner reduction back to canonical slots is 2^D dense rolls.

    Gradients: d_table (exact per-row sums), d_w8 from bf16-saved forward
    features, d_w1 = 0 (w1 is redundant given w8), d_idx = None.
    """
    level_sizes = tuple(int(m) for m in level_sizes)
    level_offsets = tuple(int(o) for o in level_offsets)
    level_shifts = tuple(tuple(int(s) for s in ss) for ss in level_shifts)
    F = int(n_features)
    D = int(n_input_dims)
    C = 1 << D
    w = C * F
    P = 128 // w if 128 % w == 0 else 1
    L = len(level_sizes)
    # Forward gather dtype: f32 — both alternatives measured NEGATIVE on the
    # REAL train step (v5e, scratch/probe_step_quick.py, in-program chains):
    # * sorted forward gathers (VERDICT r3 #3): sort+monotone-gather+unsort
    #   loses to the plain random row gather at every table size on uniform
    #   keys (13.2 vs 5.9 ms at m=2^19, scratch/probe_sorted_fwd.py) — the
    #   two sorts dominate.
    # * bf16 brick tables: 2× on ISOLATED uniform-random gathers (44.6 →
    #   89.3 M rows/s at [2^19,16]), but the full step REGRESSED 130 → 160
    #   ms (both per-level and single whole-table casts): real march samples
    #   are spatially correlated, so the in-step gathers already ride cache
    #   locality and the casts/bf16 layout only add work.
    feat_dtype = jnp.float32
    if os.environ.get("NERFSHOP_BF16_TABLES") == "1" and jax.default_backend() != "cpu":
        feat_dtype = jnp.bfloat16  # probe knob for render-path A/Bs

    def _slice(table, l):
        return jax.lax.slice_in_dim(table, level_offsets[l], level_offsets[l] + level_sizes[l])

    def _forward_feats(table, idx):
        """→ feats [L, N, C, F] (corner features per sample per level).

        One row-gather per level from the [m, C·F] brick table (derived from
        the canonical slice by 2^D cheap axis-0 rolls + a minor-dim concat).

        Row width is the dominant gather variable on v5e (measured,
        scratch/probe_gather_landscape.py, [2^19, w] uniform-random rows):
        w=16 → 52 M rows/s, w=32 → 28 M (!), w=64 → 198 M, w=128 → 121 M.
        So when w < 64, ``Pk`` consecutive brick rows are packed into one
        64-lane physical row by a free row-major reshape; the gather fetches
        row idx//Pk at the fast width and a one-hot einsum selects the
        (idx % Pk)-th w-lane block in-register. (An earlier 128-lane
        INTERLEAVED packing lost to its build cost; the reshape packing's
        build is the same rolls+concat plus a layout-only reshape.)"""
        N = idx.shape[1]
        if feat_dtype != table.dtype:
            # ONE whole-table cast pass; per-level casts measured +30 ms on
            # the full step (XLA re-materialized them per level)
            table = jax.lax.optimization_barrier(table.astype(feat_dtype))
        pack64 = os.environ.get("NERFSHOP_PACK64", "0") == "1"
        Pk = 64 // w if (pack64 and w < 64 and 64 % w == 0) else 1
        feats = []
        for l in range(L):
            Tl = _slice(table, l)
            rolls = [Tl if s == 0 else jnp.roll(Tl, -s, axis=0) for s in level_shifts[l]]
            brick = jnp.concatenate(rolls, axis=1)  # [m, C·F]
            if Pk > 1 and level_sizes[l] % Pk == 0:
                packed = jax.lax.optimization_barrier(
                    brick.reshape(level_sizes[l] // Pk, Pk * w)
                )
                rows = jnp.take(packed, idx[l] // Pk, axis=0)  # [N, Pk·w]
                sel = (idx[l] % Pk)[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (1, Pk), 1
                )
                f = jnp.einsum(
                    "npw,np->nw",
                    rows.reshape(N, Pk, w),
                    sel.astype(rows.dtype),
                )
                feats.append(f.reshape(N, C, F))
            else:
                brick = jax.lax.optimization_barrier(brick)
                feats.append(jnp.take(brick, idx[l], axis=0).reshape(N, C, F))
        return jnp.stack(feats)

    def _reference(table, idx, w8, w1):
        feats = _forward_feats(table, idx)
        return jnp.einsum(
            "lnc,lncf->lnf", w8.astype(feats.dtype), feats,
            preferred_element_type=jnp.float32,
        )

    if jax.default_backend() == "cpu" and not force_segment:
        # XLA:CPU scatters at memory speed — native autodiff beats the
        # pipeline there and keeps the CPU test suite fast.
        return _reference

    @jax.custom_vjp
    def encode(table, idx, w8, w1):
        return _reference(table, idx, w8, w1)

    def fwd(table, idx, w8, w1):
        feats = _forward_feats(table, idx)
        out = jnp.einsum(
            "lnc,lncf->lnf", w8.astype(feats.dtype), feats,
            preferred_element_type=jnp.float32,
        )
        return out, (idx, w8, w1, feats.astype(jnp.bfloat16))

    def bwd(res, dout):
        idx, w8, w1, feats = res
        N = idx.shape[1]
        dout = dout.astype(jnp.float32)
        d_w8 = jnp.einsum("lnf,lncf->lnc", dout, feats.astype(jnp.float32))

        big = [l for l in range(L) if level_sizes[l] > matmul_max]
        small = [l for l in range(L) if level_sizes[l] <= matmul_max]

        dB = {}  # level → [m, C·F] brick-row gradient
        if small:
            for l in small:
                m = level_sizes[l]
                ct = (w8[l][:, :, None] * dout[l][:, None, :]).reshape(N, w)
                A = (
                    idx[l][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
                ).astype(jnp.bfloat16)
                hi = ct.astype(jnp.bfloat16)
                loq = (ct - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = jax.lax.dot_general(
                    A, hi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                acc = acc + jax.lax.dot_general(
                    A, loq, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                dB[l] = acc

        if big:
            # one batched sort: key + D fracs + F dout columns, all [Lb, N]
            kb = jnp.stack([idx[l] for l in big])
            ops = (kb,) + tuple(w1[jnp.asarray(big), :, d] for d in range(D)) + tuple(
                dout[jnp.asarray(big), :, f] for f in range(F)
            )
            sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
            kb_s = sorted_ops[0]
        up = USE_PALLAS if use_pallas is None else use_pallas
        if big and up and N % 128 == 0 and 128 % w == 0:
            # Pallas path: one kernel per level turns the sorted stream into
            # per-row sums with block-local one-hot MXU matmuls — no prefix
            # arrays, histograms, or boundary gathers (ops/pallas_segsum.py).
            from nerfshop_tpu.ops import pallas_segsum

            for gi, l in enumerate(big):
                w1_s = jnp.stack(
                    [sorted_ops[1 + d][gi] for d in range(D)], axis=-1
                )
                d_s = jnp.stack(
                    [sorted_ops[1 + D + f][gi] for f in range(F)], axis=-1
                )
                dB[l] = pallas_segsum.sorted_segment_rowsum(
                    kb_s[gi], w1_s, d_s, level_sizes[l]
                )
        elif big:
            # G logical rows share one 128-lane group: place each sample's
            # w-wide cotangent at lane block (idx % G) and segment-sum over
            # the COARSE key idx//G — samples of different fine rows in the
            # same coarse segment occupy disjoint lanes, so one coarse
            # segment sum yields ALL G fine-row sums side by side. The
            # histogram shrinks G× and the boundary gather becomes G× fewer
            # 128-lane rows (gathers are row-count-bound on v5e: measured
            # 0.25 ms vs 2-3 ms per level for the 16-wide m+1-row form).
            # Levels run in GROUPS of 4 with explicit stage barriers:
            # full batching over all 16 levels held >6 GB of [L,N,128]
            # intermediates live and blew HBM, while fully-fused per-level
            # processing let XLA build pathological mega-fusions (+100 ms —
            # the isolated stages measure 15x faster when they consume
            # materialized buffers, which the barriers reproduce).
            G = 128 // w if 128 % w == 0 else 1
            lanes = G * w
            WB = 16  # two-level blocked prefix sum: 14 vs 30 ms flat on v5e
            LG = 4
            for g0 in range(0, len(big), LG):
                grp = big[g0 : g0 + LG]
                ng = len(grp)
                kg = kb_s[g0 : g0 + ng]  # [ng, N] sorted keys
                w1_g = jnp.stack(
                    [sorted_ops[1 + d][g0 : g0 + ng] for d in range(D)], axis=-1
                )  # [ng, N, D]
                d_g = jnp.stack(
                    [sorted_ops[1 + D + f][g0 : g0 + ng] for f in range(F)], axis=-1
                )
                w8_g = corner_products(w1_g)  # [ng, N, C]
                ct_s = (w8_g[..., :, None] * d_g[..., None, :]).reshape(ng, N, w)
                ct_s = jax.lax.optimization_barrier(ct_s)
                if G > 1:
                    j = (kg % G)[..., None]
                    ct128 = jnp.concatenate(
                        [jnp.where(j == k, ct_s, 0.0) for k in range(G)], axis=-1
                    )  # [ng, N, 128]
                else:
                    ct128 = ct_s
                ct128 = jax.lax.optimization_barrier(ct128)
                if N % WB == 0:
                    xb = ct128.reshape(ng, N // WB, WB, lanes)
                    bsum = xb.sum(axis=2)
                    pre = jnp.cumsum(bsum, axis=1) - bsum  # exclusive block prefix
                    cs = (jnp.cumsum(xb, axis=2) + pre[:, :, None, :]).reshape(ng, N, lanes)
                else:
                    cs = jnp.cumsum(ct128, axis=1)
                cs_ext = jnp.concatenate(
                    [jnp.zeros((ng, 1, lanes), cs.dtype), cs], axis=1
                )
                # batched coarse histogram for the whole group: ONE einsum
                # (per-level exact_histogram calls are launch-overhead-bound:
                # 1.3 ms each vs ~0.2 ms/level batched on v5e)
                bins_g = max(
                    -(-(level_sizes[l] // G) // 128) * 128 for l in grp
                )
                kgc = kg // G
                Hh = bins_g // 128
                Ah = (
                    (kgc >> 7)[..., None]
                    == jax.lax.broadcasted_iota(jnp.int32, (1, 1, Hh), 2)
                ).astype(jnp.bfloat16)
                Bl = (
                    (kgc & 127)[..., None]
                    == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
                ).astype(jnp.bfloat16)
                counts_g = jnp.einsum(
                    "gnh,gnl->ghl", Ah, Bl, preferred_element_type=jnp.float32
                ).reshape(ng, bins_g)
                for gi, l in enumerate(grp):
                    m = level_sizes[l]
                    kl = kg[gi]
                    mg = m // G  # coarse rows (m % 128 == 0 ⇒ integral)
                    counts = counts_g[gi]
                    b = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)])
                    b = jax.lax.optimization_barrier(b.astype(jnp.int32)[: mg + 1])
                    # barrier the PER-LEVEL 2D buffer: a gather whose operand
                    # is a fused slice of the 3D stack runs ~100x slower
                    cs_l = jax.lax.optimization_barrier(cs_ext[gi])
                    cb = jnp.take(cs_l, b, axis=0)  # [mg+1, 128]
                    # materialize before the corner reduction: the 2^D
                    # per-corner slices would otherwise FUSE with (and
                    # re-execute) this gather+diff 2^D times (+660 ms)
                    dB[l] = jax.lax.optimization_barrier(
                        (cb[1:] - cb[:-1]).reshape(m, w)
                    )

        # corner reduction: brick column block c rolls back by +s_c
        d_levels = []
        for l in range(L):
            g = dB[l].reshape(level_sizes[l], C, F)
            acc = None
            for c, s in enumerate(level_shifts[l]):
                gc = g[:, c, :]
                gc = gc if s == 0 else jnp.roll(gc, s, axis=0)
                acc = gc if acc is None else acc + gc
            d_levels.append(acc)
        d_table = jnp.concatenate(d_levels, axis=0)
        return d_table, None, d_w8, jnp.zeros_like(w1)

    encode.defvjp(fwd, bwd)
    return encode


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
