"""Occupancy-guided ray marching, restructured for XLA/TPU.

TPU-native redesign of the reference's ragged CUDA march
(src/testbed_nerf.cu:1087-1253 ``generate_training_samples_nerf``, 637
``generate_next_nerf_network_inputs``, src/common_nerf.cu
``advance_to_next_voxel``). The CUDA code walks each ray sequentially with
per-thread loops, DDA voxel skipping, atomic sample budgets and host-synced
compaction. None of that maps to the TPU: sequential ``scan``/``while_loop``
iterations have a ~50-100 µs floor each on real chips, so ANY per-step
formulation is dead on arrival. The march here is ONE SHOT — every op is a
dense [R, M] tensor op:

1. **Closed-form step ladder.** The reference's ``t += clamp(t·cone, dt_min,
   dt_max)`` recurrence has an exact closed form in three segments (linear
   at dt_min → geometric ×(1+cone) → linear at dt_max); candidate positions
   ``T[r, m]`` for m = 0..M−1 are computed directly, no loop. M = 1024
   candidates at the base step √3/1024 span the full unit-AABB diagonal
   (the reference's 1024-steps/ray budget, common_nerf.h:25) and the
   geometric segment covers larger aabb_scales.
2. **One occupancy gather** over all [R, M] candidates (cascade/mip chosen
   per candidate exactly like mip_from_dt).
3. **Transmittance proxy** (optional): a second gather of the density grid
   gives a conservative optical-depth cumsum used for early termination at
   render time (the analog of the trace loop's T < ε break).
4. **Rank-based compaction** into the fixed [R, K] slab, scatter-free:

   * ``selection="first"`` (rendering): the first K occupied candidates in
     march order, via ``top_k`` over a monotone score.
   * ``selection="spread"`` (training): K *stratified* picks over ALL
     occupied candidates of the ray, each carrying ``dt × stride`` so the
     optical-depth integral stays calibrated. When a ray has ≤ K occupied
     candidates this reduces exactly to "first". This removes the
     truncation bias of a first-K budget under a dense warm-up grid (every
     cell occupied → first-K would only ever sample a thin shell at the
     AABB entry; the reference escapes via its 1024-step loop, we escape
     via stratification).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfshop_tpu.common import (
    GRID_RESOLUTION,
    MIN_CONE_STEPSIZE,
    MAX_CONE_STEPSIZE,
)
from nerfshop_tpu.ops import coords
from nerfshop_tpu.ops.coords import BoundingBox


class SampleBatch(NamedTuple):
    """Fixed-shape per-ray samples; invalid slots are masked."""

    t: jnp.ndarray  # [R, K] ray parameter at sample start
    dt: jnp.ndarray  # [R, K]
    valid: jnp.ndarray  # [R, K] bool
    n: jnp.ndarray  # [R] int32 number of valid samples

    @property
    def n_rays(self) -> int:
        return self.t.shape[0]

    @property
    def k(self) -> int:
        return self.t.shape[1]


class MarchAux(NamedTuple):
    """Extra per-ray march outputs for multi-window rendering."""

    t_last: jnp.ndarray  # [R] t just past the last emitted sample
    saturated: jnp.ndarray  # [R] bool — grid early-stop fired (proxy opaque)
    exhausted: jnp.ndarray  # [R] bool — more occupied candidates than K


def step_ladder(t0: jnp.ndarray, m: jnp.ndarray, cone_angle) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed form of the reference's sequential t-recurrence.

    t0: [R] start values; m: [M] step indices → (T [R,M], dt [R,M]).
    Segment 1: dt_min steps until t ≥ t_a = dt_min/cone.
    Segment 2: geometric ×(1+cone) until t ≥ t_b = dt_max/cone.
    Segment 3: dt_max steps.
    """
    cone = jnp.asarray(cone_angle, jnp.float32)
    eps = 1e-12
    # cone == 0 → everything stays in segment 1 (t_a = ∞)
    t_a = jnp.where(cone > 0, MIN_CONE_STEPSIZE / jnp.maximum(cone, eps), jnp.inf)
    t_b = jnp.where(cone > 0, MAX_CONE_STEPSIZE / jnp.maximum(cone, eps), jnp.inf)

    m = m.astype(jnp.float32)
    m = m[None, :] if m.ndim == 1 else m  # [1, M] or [R, M]
    t0 = t0[:, None]  # [R, 1]

    m1 = jnp.ceil(jnp.maximum(t_a - t0, 0.0) / MIN_CONE_STEPSIZE)  # [R,1]
    t1 = t0 + m1 * MIN_CONE_STEPSIZE  # first t in geometric region
    g = 1.0 + cone
    logg = jnp.log(jnp.maximum(g, 1.0 + eps))
    m2 = jnp.where(
        jnp.isfinite(t_b),
        jnp.ceil(jnp.maximum(jnp.log(jnp.maximum(t_b, eps) / jnp.maximum(t1, eps)), 0.0) / logg),
        jnp.inf,
    )
    t2 = t1 * jnp.exp(logg * m2)  # first t in dt_max region

    T_lin = t0 + m * MIN_CONE_STEPSIZE
    T_geo = t1 * jnp.exp(logg * jnp.maximum(m - m1, 0.0))
    T_max = jnp.where(jnp.isfinite(t2), t2 + jnp.maximum(m - m1 - m2, 0.0) * MAX_CONE_STEPSIZE, T_geo)
    T = jnp.where(m <= m1, T_lin, jnp.where(m <= m1 + m2, T_geo, T_max))
    dt = coords.calc_dt(T, cone)
    return T, dt


def _candidate_cells(origins, directions, T, dt, n_cascades, resolution: Optional[int] = None):
    """Ladder positions → flat cascaded-grid indices [R, M] (mip_from_dt +
    cascaded_grid_idx_at, src/common_nerf.cu). ``resolution`` overrides the
    grid resolution (e.g. the 16³ coarse chain) — the mip choice still uses
    the fine-grid formula so coarse and fine stages agree on cascades."""
    Rg = GRID_RESOLUTION
    px = origins[:, 0:1] + T * directions[:, 0:1]
    py = origins[:, 1:2] + T * directions[:, 1:2]
    pz = origins[:, 2:3] + T * directions[:, 2:3]

    # mip_from_dt: cascade from position extent, coarsened by step width
    maxval = jnp.maximum(jnp.maximum(jnp.abs(px - 0.5), jnp.abs(py - 0.5)), jnp.abs(pz - 0.5))
    mip_pos = jnp.clip(
        jnp.floor(jnp.log2(jnp.maximum(maxval, 1e-12))).astype(jnp.int32) + 2, 0, n_cascades - 1
    )
    d_scaled = dt * (2 * Rg)
    expo = jnp.floor(jnp.log2(jnp.maximum(d_scaled, 1e-12))).astype(jnp.int32) + 1
    mip = jnp.where(
        d_scaled < 1.0, mip_pos, jnp.clip(jnp.maximum(expo, mip_pos), 0, n_cascades - 1)
    )

    mip_scale = jnp.exp2(-mip.astype(jnp.float32))
    Ro = Rg if resolution is None else resolution

    def cell_of(p):
        q = (p - 0.5) * mip_scale + 0.5
        return jnp.clip(jnp.floor(q * Ro).astype(jnp.int32), 0, Ro - 1)

    ix, iy, iz = cell_of(px), cell_of(py), cell_of(pz)
    flat = ((mip * Ro + ix) * Ro + iy) * Ro + iz  # [R, M]
    return flat


#: coarse-segment length in fine ladder steps (stage-1 stride). A segment
#: spans ≤ Q·MAX_CONE_STEPSIZE ≈ 0.108 world units — always within ±1 coarse
#: cell of its midpoint for the 16³-per-cascade coarse grid below, so a
#: midpoint probe of the 3³-dilated coarse field is conservative.
COARSE_STRIDE = 8
#: per-cascade coarse occupancy resolution (128 / COARSE_STRIDE / 2)
COARSE_RES = 16


def build_coarse_occupancy(occupancy: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """[C,128,128,128] bool → dilated coarse mip chain [C,16,16,16] float32
    (>0 = some fine cell occupied nearby).

    Conservative closures so probing the two ENDPOINTS of each
    ``COARSE_STRIDE``-step segment (at their own mips) is safe for every
    sample inside the segment:
    1. **8³ max-pool** per cascade to the coarse resolution;
    2. **downward closure**: pooled finer-cascade content is OR'd into the
       next coarser cascade's center octant (the bitfield invariant,
       update_bitfield) — interior samples whose mip dips below the
       endpoints' mips (closest-approach V of mip_from_pos) stay covered;
    3. **3³ dilation**: a segment spans at most one coarse cell of any mip
       its samples can select, so ±1 around an endpoint's cell covers the
       segment interior.
    """
    C = occupancy.shape[0]
    Rg = occupancy.shape[1]
    s = Rg // COARSE_RES
    d = occupancy.reshape(C, COARSE_RES, s, COARSE_RES, s, COARSE_RES, s).any(axis=(2, 4, 6))
    if C > 1:
        g = COARSE_RES
        lo, hi = g // 4, g // 4 + g // 2
        levels = [d[0]]
        for k in range(1, C):
            pooled = levels[k - 1].reshape(g // 2, 2, g // 2, 2, g // 2, 2).any(axis=(1, 3, 5))
            levels.append(d[k].at[lo:hi, lo:hi, lo:hi].max(pooled))
        d = jnp.stack(levels)
    for axis in (1, 2, 3):
        acc = d
        for s in range(1, dilation + 1):
            acc = acc | jnp.roll(d, s, axis) | jnp.roll(d, -s, axis)
        d = acc
    return d.astype(jnp.float32)


def masked_density_field(occupancy: jnp.ndarray, density: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Fuse occupancy + density into ONE gatherable field: value > 0 iff the
    cell is occupied; the value is the (EMA) density for transmittance
    proxies. Halves the march's random-gather count."""
    if density is None:
        return occupancy.astype(jnp.float32)
    return jnp.where(occupancy, jnp.maximum(density, 1e-30), 0.0)


def _sorted_first(keys: jnp.ndarray, payloads: Tuple[jnp.ndarray, ...], take: int):
    """Sort rows of ``keys`` ascending carrying ``payloads`` (lax.sort —
    bitonic VPU network, zero gathers) and keep the first ``take`` columns."""
    ops = (keys,) + tuple(payloads)
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    return tuple(o[:, :take] for o in sorted_ops)


@partial(
    jax.jit,
    static_argnames=("k_samples", "n_candidates", "use_grid_early_stop", "selection", "with_aux", "n_segments", "global_t0", "intersect_margin"),
)
def march_rays(
    origins: jnp.ndarray,  # [R, 3] world
    directions: jnp.ndarray,  # [R, 3] unit
    occupancy: jnp.ndarray,  # [C, R, R, R] bool
    aabb_lo: jnp.ndarray,  # [3]
    aabb_hi: jnp.ndarray,  # [3]
    cone_angle: jnp.ndarray,  # []
    t_jitter: Optional[jnp.ndarray] = None,  # [R] in [0,1) or None
    t_start_min: float = 0.0,
    t_start: Optional[jnp.ndarray] = None,  # [R] per-ray start override
    k_samples: int = 32,
    n_candidates: int = 1024,
    density_grid: Optional[jnp.ndarray] = None,
    use_grid_early_stop: bool = False,
    grid_stop_tau: float = 8.0,
    selection: str = "first",  # "first" (render) | "spread" (training)
    spread_rng: Optional[jnp.ndarray] = None,  # [R, K] u(0,1) stratum jitter
    spread_stride_cap: float = 4.0,
    with_aux: bool = False,
    n_segments: Optional[int] = None,
    coarse_field: Optional[jnp.ndarray] = None,  # flat override (pre-dilated)
    fine_field: Optional[jnp.ndarray] = None,  # flat override (pre-dilated)
    tau_field: Optional[jnp.ndarray] = None,  # flat UNdilated density for the
    # transmittance proxy (when fine_field is a dilated override, its values
    # overestimate optical depth for rays that graze dense regions without
    # entering them — the early stop would truncate far content)
    global_t0: bool = False,  # shared ladder origin at t_start_min (tiles)
    intersect_margin: float = 0.0,  # expand the AABB intersect window (world
    # units) — tile-center marches use the tile frustum's footprint so
    # member rays at AABB-silhouette tiles aren't culled by a center miss
):
    """Two-stage (coarse→fine) occupancy march.

    Stage 1 probes ONE dilated 16³-per-cascade coarse cell per
    ``COARSE_STRIDE``-step segment of the ladder (conservative:
    :func:`build_coarse_occupancy`), stage 2 gathers the fused
    density-or-zero field only inside surviving segments. Candidate
    positions are identical to a flat ladder of ``n_candidates`` steps —
    stage 1 only *skips* provably-empty segments — but the march costs
    ~M/4 random gathers instead of ~2.4·M (the dominant term on TPU, where
    random HBM lookups run at ~10⁸/s regardless of row width). Selection
    and stratified spread run on lax.sort networks (VPU) instead of
    binary-search gathers."""
    R = origins.shape[0]
    K = k_samples
    Q = COARSE_STRIDE
    M = -(-n_candidates // Q) * Q
    M1 = M // Q
    n_cascades = occupancy.shape[0]
    aabb = BoundingBox(aabb_lo, aabb_hi)
    if n_segments is None:
        S = max(K, 32) if selection == "spread" else max(K // 2, 16)
    else:
        S = n_segments
    S = min(S, M1)
    J = S * Q  # fine candidates examined

    coarse = coarse_field if coarse_field is not None else build_coarse_occupancy(occupancy).reshape(-1)
    if fine_field is not None:
        dens_field = fine_field
    else:
        dens_field = masked_density_field(occupancy, density_grid).reshape(-1)

    if intersect_margin:
        ibox = BoundingBox(aabb_lo - intersect_margin, aabb_hi + intersect_margin)
        tmin, tmax = ibox.ray_intersect(origins, directions)
    else:
        tmin, tmax = aabb.ray_intersect(origins, directions)
    tmin = jnp.maximum(tmin, t_start_min)
    if t_start is not None:
        tmin = jnp.maximum(tmin, t_start)
    hit = tmin < tmax
    if global_t0:
        # tile marches share one ladder origin so slot t-values are valid
        # for every member ray of the tile (members re-window by their own
        # [tmin, tmax) at eval time)
        t0 = jnp.full((R,), t_start_min, jnp.float32)
    else:
        t0 = jnp.where(hit, tmin, tmax)
    if t_jitter is not None:
        t0 = t0 + coords.calc_dt(t0, cone_angle) * t_jitter

    # ---- stage 1: segment ENDPOINTS vs the dilated coarse field -----------
    # endpoints are shared between adjacent segments → M1+1 probes; a
    # segment survives if either endpoint's coarse cell (at the endpoint's
    # own mip) is occupied — conservative for every interior sample (see
    # build_coarse_occupancy)
    m_end = jnp.arange(M1 + 1, dtype=jnp.int32) * Q
    T_end_pts, dt_end_pts = step_ladder(t0, m_end, cone_angle)  # [R, M1+1]
    cflat = _candidate_cells(
        origins, directions, T_end_pts, dt_end_pts, n_cascades, resolution=COARSE_RES
    )
    cflat = jax.lax.optimization_barrier(cflat)
    probe = jnp.take(coarse, cflat, axis=0) > 0  # [R, M1+1]
    seg_inside = T_end_pts[:, :-1] < tmax[:, None]
    seg_occ = (probe[:, :-1] | probe[:, 1:]) & seg_inside  # [R, M1]

    seg_ids = jnp.broadcast_to(jnp.arange(M1, dtype=jnp.int32)[None, :], (R, M1))
    seg_keys = jnp.where(seg_occ, seg_ids, seg_ids + M1)
    (seg_sorted,) = _sorted_first(seg_keys, (), M1)
    n_seg = jnp.sum(seg_occ.astype(jnp.int32), axis=1)  # [R]

    if selection == "spread":
        # stratified pick over occupied segments so training covers the
        # whole occupied extent of the ray, not just its entry region
        stride_s = jnp.clip(n_seg.astype(jnp.float32) / S, 1.0, spread_stride_cap)
        u_s = spread_rng[:, 0:1] if spread_rng is not None else 0.5
        js_raw = ((jnp.arange(S, dtype=jnp.float32)[None, :] + u_s) * stride_s[:, None]).astype(jnp.int32)
        js = jnp.minimum(js_raw, jnp.maximum(n_seg, 1)[:, None] - 1)
        sel_keys = jnp.take_along_axis(seg_sorted, js, axis=1)
        # clamped picks are duplicates of the last occupied segment — invalid
        pick_ok = js_raw < n_seg[:, None]
    else:
        stride_s = jnp.ones((R,), jnp.float32)
        sel_keys = seg_sorted[:, :S]
        pick_ok = True
    seg_valid = (sel_keys < M1) & pick_ok  # [R, S]
    seg_m = jnp.where(seg_valid, sel_keys, sel_keys - M1)

    # ---- stage 2: fine ladder inside surviving segments -------------------
    m_f = (seg_m[:, :, None] * Q + jnp.arange(Q, dtype=jnp.int32)[None, None, :]).reshape(R, J)
    T_f, dt_f = step_ladder(t0, m_f, cone_angle)  # [R, J]
    inside_f = (T_f < tmax[:, None]) & jnp.repeat(seg_valid, Q, axis=1)

    fflat = _candidate_cells(origins, directions, T_f, dt_f, n_cascades)
    fflat = jax.lax.optimization_barrier(fflat)
    dens = jnp.take(dens_field, fflat, axis=0)
    dens = jnp.where(inside_f, dens, 0.0)
    occ_f = dens > 0  # [R, J], in ladder order (segments ascend)

    saturated = jnp.zeros((R,), jnp.bool_)
    if use_grid_early_stop and (density_grid is not None or fine_field is not None):
        if tau_field is not None:
            # undilated density for the optical-depth proxy: a dilated
            # fine_field overestimates tau for rays that graze dense
            # regions, truncating far content at the silhouette
            tau_dens = jnp.where(inside_f, jnp.take(tau_field, fflat, axis=0), 0.0)
        else:
            tau_dens = dens
        tau = jnp.cumsum(jnp.where(occ_f, tau_dens * dt_f, 0.0), axis=1)
        keep = (tau - tau_dens * dt_f) < grid_stop_tau  # exclusive cumsum test
        saturated = jnp.any(occ_f & ~keep, axis=1)
        occ_f &= keep

    nocc = jnp.sum(occ_f.astype(jnp.int32), axis=1)  # [R]
    fine_ids = jnp.broadcast_to(jnp.arange(J, dtype=jnp.int32)[None, :], (R, J))
    fine_keys = jnp.where(occ_f, fine_ids, fine_ids + J)
    # dt is a pure function of t (calc_dt) — recompute after the sort
    # instead of carrying a second payload through the bitonic network
    _, t_sorted = _sorted_first(fine_keys, (T_f,), J)
    dt_sorted = coords.calc_dt(t_sorted, cone_angle)

    if selection == "spread":
        stride_f = jnp.clip(nocc.astype(jnp.float32) / K, 1.0, spread_stride_cap)
        ks = jnp.arange(K, dtype=jnp.float32)[None, :]
        u = spread_rng if spread_rng is not None else jnp.full((R, K), 0.5)
        jk = ((ks + u) * stride_f[:, None]).astype(jnp.int32)
        jk = jnp.minimum(jk, jnp.maximum(nocc, 1)[:, None] - 1)
        out_t = jnp.take_along_axis(t_sorted, jk, axis=1)
        out_dt_raw = jnp.take_along_axis(dt_sorted, jk, axis=1)
        # dt scaled by the TOTAL subsampling ratio, capped (uncapped coarse
        # quadrature lets training settle into a fog equilibrium)
        out_dt = out_dt_raw * jnp.clip(stride_s * stride_f, 1.0, spread_stride_cap)[:, None]
        n = jnp.minimum(nocc, K)
    else:
        out_t = t_sorted[:, :K]
        out_dt = dt_sorted[:, :K]
        n = jnp.minimum(nocc, K)

    n = jnp.where(hit, n, 0)
    valid = jnp.arange(K, dtype=jnp.int32)[None, :] < n[:, None]
    out_t = jnp.where(valid, out_t, 0.0)
    out_dt = jnp.where(valid, out_dt, 0.0)
    batch = SampleBatch(t=out_t, dt=out_dt, valid=valid, n=n)
    if not with_aux:
        return batch
    # continuation point for multi-window rendering: just past the last
    # emitted sample when the K budget filled; else past the last EXAMINED
    # segment when stage 1 had more occupied segments than S; else ray done
    last_sample_end = jnp.max(jnp.where(valid, out_t + out_dt, 0.0), axis=1)
    last_seg = jnp.max(jnp.where(seg_valid, seg_m, -1), axis=1)  # [-1 if none]
    seg_end_t, _ = step_ladder(t0, (last_seg[:, None] + 1) * Q, cone_angle)
    seg_exhausted = n_seg > S
    T_end, _ = step_ladder(t0, jnp.full((R, 1), M - 1, jnp.int32), cone_angle)
    t_done = jnp.where(hit, T_end[:, 0], tmax)
    t_last = jnp.where(
        nocc > K,
        last_sample_end,
        jnp.where(seg_exhausted, seg_end_t[:, 0], t_done),
    )
    exhausted = ((nocc > K) | seg_exhausted) & hit
    return batch, MarchAux(t_last=t_last, saturated=saturated, exhausted=exhausted)


def dilate_field(field: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Per-cascade 3D max-dilation of a [C,R,R,R] field by ±radius cells
    (separable max-pool via reduce_window — minor-axis jnp.roll lowers to
    slow unaligned lane shifts on TPU, ~65 ms per 128³ roll). Used to make
    per-TILE marching conservative for every member ray of the tile."""
    w = 2 * radius + 1
    return jax.lax.reduce_window(
        field,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, w, w, w),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )


def march_tiles(
    origins: jnp.ndarray,  # [T, 3] tile-center ray origins
    directions: jnp.ndarray,  # [T, 3] unit
    coarse_dilated: jnp.ndarray,  # [C·16³] from build_coarse_occupancy(dilated occ)
    fine_dilated: jnp.ndarray,  # [C·128³] dilate_field(masked_density, r)
    aabb_lo,
    aabb_hi,
    cone_angle,
    n_cascades: int,
    t_start_min: float = 0.0,
    k_slots: int = 96,
    n_candidates: int = 1024,
    n_segments: int = 32,
    fine_undilated: Optional[jnp.ndarray] = None,  # flat masked density for
    # the early-stop tau proxy (see march_rays tau_field)
    dilation_cells: int = 2,  # fine-cell dilation radius baked into the
    # fields; sizes the AABB intersect margin for silhouette tiles
):
    """Shared-march for TILED rendering: ONE two-stage march per 8×8-pixel
    tile instead of per ray — a thin wrapper over :func:`march_rays` with

    * pre-DILATED coarse/fine fields (dilation ≥ the tile frustum's world
      footprint) so the tile-center march is conservative for every member
      ray;
    * a GLOBAL ladder (t from ``t_start_min``, not the per-ray AABB entry)
      so slot t-values are valid for every member ray;
    * "spread" slot selection + the grid-density early stop: under a dense
      (foggy / warm-up) grid the occupied path is far longer than K slots,
      and first-K would confine every sample to a sliver at the near plane
      (the empty-fox-render failure mode). Stratified slots with
      stride-scaled dt keep the full path covered at coarser quadrature,
      exactly like the training march.

    → (t_slots [T,K], dt_slots [T,K], slot_valid [T,K], n [T]), ascending t.
    Per-RAY gather cost is zero; the per-tile cost is ~(M/Q + S·Q) gathers,
    amortized over the tile's member rays.
    """
    occupancy_stub = jnp.zeros((n_cascades, 1, 1, 1), jnp.bool_)
    # widest cascade's cell size × dilation radius: member rays of a
    # silhouette tile can hit cells the dilation reaches outside the AABB
    cell = float(2 ** (n_cascades - 1)) / GRID_RESOLUTION
    batch = march_rays(
        origins,
        directions,
        occupancy_stub,
        aabb_lo,
        aabb_hi,
        cone_angle,
        t_start_min=t_start_min,
        k_samples=k_slots,
        n_candidates=n_candidates,
        use_grid_early_stop=True,
        selection="spread",
        spread_stride_cap=16.0,
        n_segments=n_segments,
        coarse_field=coarse_dilated,
        fine_field=fine_dilated,
        tau_field=fine_undilated,
        global_t0=True,
        intersect_margin=dilation_cells * cell,
    )
    return batch.t, batch.dt, batch.valid, batch.n


def coarse_any_hit(
    origins: jnp.ndarray,  # [T, 3]
    directions: jnp.ndarray,  # [T, 3] unit
    coarse_dilated: jnp.ndarray,  # [C·16³] from build_coarse_occupancy
    aabb_lo,
    aabb_hi,
    cone_angle,
    n_cascades: int,
    t_start_min: float = 0.0,
    n_candidates: int = 1024,
    intersect_margin: float = 0.0,
) -> jnp.ndarray:
    """Cheap tile-cull predicate: does the ray's ladder touch ANY occupied
    coarse cell? Probes only the 16³-per-cascade dilated chain (20 KB —
    VMEM-speed gathers), ~M/8 probes per ray. Conservative superset of
    march_tiles' stage-1 survivors; used to skip whole 8×8 pixel tiles
    before the full march+eval (the analog of the reference's early ray
    retirement at init, advance_pos_nerf testbed_nerf.cu:557)."""
    Tn = origins.shape[0]
    Q = COARSE_STRIDE
    M1 = (-(-n_candidates // Q) * Q) // Q
    aabb = BoundingBox(aabb_lo - intersect_margin, aabb_hi + intersect_margin)
    tmin, tmax = aabb.ray_intersect(origins, directions)
    t0 = jnp.full((Tn,), t_start_min, jnp.float32)
    m_end = jnp.arange(M1 + 1, dtype=jnp.int32) * Q
    T_pts, dt_pts = step_ladder(t0, m_end, cone_angle)
    cflat = _candidate_cells(origins, directions, T_pts, dt_pts, n_cascades, resolution=COARSE_RES)
    probe = jnp.take(coarse_dilated, cflat, axis=0) > 0
    inside = (T_pts >= tmin[:, None]) & (T_pts < tmax[:, None]) & (tmin < tmax)[:, None]
    return jnp.any(probe & inside, axis=1)


def march_rays_training(
    origins,
    directions,
    occupancy,
    aabb_lo,
    aabb_hi,
    cone_angle,
    rng: Optional[jax.Array] = None,
    t_start_min: float = 0.0,
    k_samples: int = 32,
    n_candidates: int = 1024,
) -> SampleBatch:
    """Training sampler: stratified-spread selection with jittered start
    (the analog of generate_training_samples_nerf, testbed_nerf.cu:1087)."""
    R = origins.shape[0]
    if rng is not None:
        k1, k2 = jax.random.split(rng)
        t_jitter = jax.random.uniform(k1, (R,))
        spread = jax.random.uniform(k2, (R, k_samples))
    else:
        t_jitter, spread = None, None
    return march_rays(
        origins,
        directions,
        occupancy,
        aabb_lo,
        aabb_hi,
        cone_angle,
        t_jitter=t_jitter,
        t_start_min=t_start_min,
        k_samples=k_samples,
        n_candidates=n_candidates,
        selection="spread",
        spread_rng=spread,
    )


def samples_to_network_inputs(
    samples: SampleBatch,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    aabb: BoundingBox,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (warped positions [R,K,3], warped directions [R,K,3]).

    Matches the reference's NerfCoordinate packing (warp_position over the
    scene aabb, dir·0.5+0.5; common_nerf.cu:5-26). Invalid slots produce
    harmless in-range coords (t=0 → clamped)."""
    pos = origins[:, None, :] + samples.t[..., None] * directions[:, None, :]
    pos_w = jnp.clip(coords.warp_position(pos, aabb), 0.0, 1.0)
    dir_w = coords.warp_direction(directions)[:, None, :] * jnp.ones_like(pos_w)
    return pos_w, dir_w
