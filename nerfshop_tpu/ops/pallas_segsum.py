"""Pallas TPU kernel: per-row gradient sums over SORTED samples.

The brick-encode backward (ops/table_ops.make_brick_encode) needs, per hash
level, dT[r] = Σ_{n: idx_n = r} w8_n ⊗ dout_n — tcnn does this with fp16
atomicAdd (common_device.h); XLA:TPU's scatter-add is serial (~12 M rows/s),
and the previous scatter-free pipeline (lane-packed prefix sums + histogram
+ boundary gathers) materialized [N, 128] prefix arrays in HBM per level
(~4 ms/level, ~64 ms/step at batch 2^18).

This kernel exploits the one property that pipeline under-used: after the
(already batched) payload sort, every 512-coarse-row block of the output
table draws from ONE contiguous sample range. So the grid walks output
blocks; each block streams its sample range through VMEM in [RB, 128]
subchunks, reconstructs the corner-weighted cotangent rows in registers,
and accumulates the block with two one-hot matmuls on the MXU
(A [S, 512] one-hot by local coarse row × ct [S, 128] lane-packed, bf16
hi+lo split for f32-exact sums). No prefix arrays, no histogram, no
boundary gather, no HBM intermediates — each sorted sample is read once
and the output block written once.

MEASURED RESULT (v5e, scratch/probe_segsum_tpu.py): this kernel is a
recorded NEGATIVE — 665 ms for the isolated 16-level enc fwd+bwd chain vs
2.45 ms for the XLA lane-packed pipeline it was meant to replace, and
697 vs 130 ms for the full train step. The rb=16-row manual DMAs are
latency-bound (6 copies × ~2-5 µs waited serially per subchunk × ~2k
subchunks/level) and the [rb,128,128] one-hot/ct construction runs on the
VPU between every matmul pair. Kept (default-off, table_ops.USE_PALLAS)
as the documented Pallas-vs-XLA decision for VERDICT r2 #2.

Layout contract (identical to the XLA path it replaces): fine row r holds
lane group g = r % G (G = 128 // (2^D·F) fine rows share one 128-lane
coarse row c = r // G); sample ct occupies lanes [g·w, (g+1)·w).
`out[:m//G].reshape(m, w)` is the brick-table gradient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SENTINEL = 1 << 30  # pad-sample key: larger than any block threshold


def _kernel(bounds_ref, *refs, G, w, D, F, block_rows, rb, n_in):
    # refs: n_in HBM inputs, out_ref, acc, n_in vmem bufs, sem
    in_refs = refs[:n_in]
    out_ref = refs[n_in]
    acc = refs[n_in + 1]
    bufs = refs[n_in + 2 : n_in + 2 + n_in]
    sem = refs[n_in + 2 + n_in]

    j = pl.program_id(0)
    s0 = bounds_ref[j]
    s1 = bounds_ref[j + 1]
    r0 = s0 // LANES
    nrows = pl.cdiv(jnp.maximum(s1 - r0 * LANES, 0), LANES)
    niter = pl.cdiv(nrows, rb)

    acc[:] = jnp.zeros_like(acc)

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES, LANES), 2)
    g_l = lane3 // w  # lane's fine-row group
    c_l = (lane3 % w) // F  # lane's corner
    f_l = lane3 % F  # lane's feature
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES, 1), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES, 1), 1)
    blk3 = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES, block_rows), 2)

    def body(t, carry):
        rs = r0 + t * rb
        cps = [
            pltpu.make_async_copy(
                in_refs[k].at[pl.ds(rs, rb), :], bufs[k], sem.at[k]
            )
            for k in range(n_in)
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        key = bufs[0][:]  # [rb, 128] int32 (fine row ids, sorted)
        gi = rs * LANES + row_iota * LANES + lane_iota  # global sample idx
        valid = (gi >= s0) & (gi < s1)  # [rb, 128, 1]

        c_local = key // G - j * block_rows
        onehot = (
            (c_local[:, :, None] == blk3) & valid
        ).astype(jnp.bfloat16)  # [rb, 128, block_rows]

        # cotangent row: Π_d lerp(w1_d) · dout_f at the sample's lane group
        ct = jnp.ones((rb, LANES, LANES), jnp.float32)
        for d in range(D):
            w1d = bufs[1 + d][:][:, :, None]  # [rb, 128, 1]
            bit = (c_l >> d) & 1
            ct = ct * jnp.where(bit == 1, w1d, 1.0 - w1d)
        dsel = bufs[1 + D][:][:, :, None]
        for f in range(1, F):
            dsel = jnp.where(f_l == f, bufs[1 + D + f][:][:, :, None], dsel)
        ct = ct * dsel
        gmask = (g_l == (key % G)[:, :, None]) & valid
        ct = jnp.where(gmask, ct, 0.0)

        hi = ct.astype(jnp.bfloat16)
        lo = (ct - hi.astype(jnp.float32)).astype(jnp.bfloat16)

        S = rb * LANES
        a2 = onehot.reshape(S, block_rows)
        dn = (((0,), (0,)), ((), ()))
        acc[:] += jax.lax.dot_general(
            a2, hi.reshape(S, LANES), dn, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            a2, lo.reshape(S, LANES), dn, preferred_element_type=jnp.float32
        )
        return carry

    jax.lax.fori_loop(0, niter, body, 0)
    out_ref[:] = acc[:]


def sorted_segment_rowsum(
    key_s: jnp.ndarray,  # [N] int32 fine row ids, SORTED ascending
    w1_s: jnp.ndarray,  # [N, D] f32 lerp fracs, in sorted order
    dout_s: jnp.ndarray,  # [N, F] f32 output cotangents, in sorted order
    m: int,  # fine rows in this level (m % 128 == 0)
    *,
    block_rows: int = 512,
    rb: int = 16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """→ [m, 2^D·F] brick-table gradient (see module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N = key_s.shape[0]
    D = w1_s.shape[-1]
    F = dout_s.shape[-1]
    w = (1 << D) * F
    assert LANES % w == 0, (D, F)
    G = LANES // w
    assert m % LANES == 0 and N % LANES == 0, (m, N)
    mg = m // G
    nblk = -(-mg // block_rows)

    bounds = jnp.searchsorted(
        key_s, jnp.arange(nblk + 1, dtype=jnp.int32) * (block_rows * G)
    ).astype(jnp.int32)

    def prep(x, fill):
        pad = jnp.full((rb * LANES,), fill, x.dtype)
        return jnp.concatenate([x, pad]).reshape(-1, LANES)

    ins = [prep(key_s, SENTINEL)]
    ins += [prep(w1_s[:, d], 0.0) for d in range(D)]
    ins += [prep(dout_s[:, f], 0.0) for f in range(F)]
    n_in = len(ins)

    out = pl.pallas_call(
        partial(
            _kernel, G=G, w=w, D=D, F=F, block_rows=block_rows, rb=rb, n_in=n_in
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
            out_specs=pl.BlockSpec(
                (block_rows, LANES), lambda j, *_: (j, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((block_rows, LANES), jnp.float32),
            ]
            + [pltpu.VMEM((rb, LANES), x.dtype) for x in ins]
            + [pltpu.SemaphoreType.DMA((n_in,))],
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * block_rows, LANES), jnp.float32),
        interpret=interpret,
    )(bounds, *ins)
    return out[:mg].reshape(m, w)
