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

    m = m.astype(jnp.float32)[None, :]  # [1, M]
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


def _candidate_cells(origins, directions, T, dt, n_cascades):
    """Ladder positions → flat cascaded-grid indices [R, M] (mip_from_dt +
    cascaded_grid_idx_at, src/common_nerf.cu)."""
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

    def cell_of(p):
        q = (p - 0.5) * mip_scale + 0.5
        return jnp.clip(jnp.floor(q * Rg).astype(jnp.int32), 0, Rg - 1)

    ix, iy, iz = cell_of(px), cell_of(py), cell_of(pz)
    flat = ((mip * Rg + ix) * Rg + iy) * Rg + iz  # [R, M]
    return flat


def _rank_select(ranks: jnp.ndarray, targets: jnp.ndarray, m_bits: int) -> jnp.ndarray:
    """Vectorized per-row binary search: for each target rank r (int32,
    ≥1), the smallest candidate index m with ranks[row, m] ≥ r.
    ranks [R, M] is a monotone inclusive cumsum; targets [R, K]."""
    R, M = ranks.shape
    K = targets.shape[1]
    lo = jnp.zeros((R, K), jnp.int32)
    hi = jnp.full((R, K), M - 1, jnp.int32)
    for _ in range(m_bits):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(ranks, mid, axis=1)
        go_right = v < targets
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return jnp.minimum(lo, M - 1)


@partial(
    jax.jit,
    static_argnames=("k_samples", "n_candidates", "use_grid_early_stop", "selection", "with_aux"),
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
):
    R = origins.shape[0]
    K = k_samples
    M = n_candidates
    m_bits = max(1, (M - 1).bit_length())
    n_cascades = occupancy.shape[0]
    aabb = BoundingBox(aabb_lo, aabb_hi)

    tmin, tmax = aabb.ray_intersect(origins, directions)
    tmin = jnp.maximum(tmin, t_start_min)
    if t_start is not None:
        tmin = jnp.maximum(tmin, t_start)
    hit = tmin < tmax
    t0 = jnp.where(hit, tmin, tmax)
    if t_jitter is not None:
        t0 = t0 + coords.calc_dt(t0, cone_angle) * t_jitter

    T, dt = step_ladder(t0, jnp.arange(M, dtype=jnp.int32), cone_angle)  # [R,M]
    inside = T < tmax[:, None]

    flat = _candidate_cells(origins, directions, T, dt, n_cascades)
    # materialize the indices before gathering: without the barrier XLA fuses
    # the whole index computation into (multiple) gather consumers and the
    # fused kernel is far slower than gather-from-materialized-indices
    flat = jax.lax.optimization_barrier(flat)
    occ = jnp.take(occupancy.reshape(-1), flat, axis=0) & inside  # one gather
    occ = jax.lax.optimization_barrier(occ)

    saturated = jnp.zeros((R,), jnp.bool_)
    if use_grid_early_stop and density_grid is not None:
        dens = jnp.take(density_grid.reshape(-1), flat, axis=0)
        tau = jnp.cumsum(jnp.where(occ, dens * dt, 0.0), axis=1)
        keep = (tau - dens * dt) < grid_stop_tau  # exclusive cumsum test
        saturated = jnp.any(occ & ~keep, axis=1)
        occ &= keep

    ranks = jnp.cumsum(occ.astype(jnp.int32), axis=1)  # [R, M] inclusive
    nocc = ranks[:, -1]  # [R]

    if selection == "spread":
        # stratified rank targets over all occupied candidates; stride-scaled
        # dt keeps the optical-depth integral calibrated when subsampling.
        # The stride is CAPPED: unboundedly coarse dt (dense warm-up grids)
        # lets training settle into a fog equilibrium — a uniform
        # semi-transparent field fits photos under coarse quadrature, the
        # occupancy grid then never clears, and renders saturate into fog.
        # Capped at ~8× the base step the quadrature stays sharp (the
        # reference trains at 1-8× base dt) while still covering 8× more
        # ray than a first-K budget.
        stride = jnp.clip(
            nocc.astype(jnp.float32) / K, 1.0, spread_stride_cap
        )[:, None]  # [R,1]
        ks = jnp.arange(K, dtype=jnp.float32)[None, :]
        u = spread_rng if spread_rng is not None else jnp.full((R, K), 0.5)
        targets_f = (ks + u) * stride  # in [0, nocc)
        targets = jnp.clip(targets_f.astype(jnp.int32) + 1, 1, jnp.maximum(nocc, 1)[:, None])
        idx = _rank_select(ranks, targets, m_bits)
        out_dt_scale = stride
    else:
        targets = jnp.broadcast_to(jnp.arange(1, K + 1, dtype=jnp.int32)[None, :], (R, K))
        idx = _rank_select(ranks, targets, m_bits)
        out_dt_scale = jnp.ones((R, 1), jnp.float32)

    out_t = jnp.take_along_axis(T, idx, axis=1)
    out_dt = jnp.take_along_axis(dt, idx, axis=1) * out_dt_scale

    n = jnp.minimum(nocc, K)
    n = jnp.where(hit, n, 0)
    valid = jnp.arange(K, dtype=jnp.int32)[None, :] < n[:, None]
    out_t = jnp.where(valid, out_t, 0.0)
    out_dt = jnp.where(valid, out_dt, 0.0)
    batch = SampleBatch(t=out_t, dt=out_dt, valid=valid, n=n)
    if not with_aux:
        return batch
    # t just past the last sample (for window continuation), and whether the
    # ray still had occupied candidates beyond the K budget
    last_t = jnp.max(jnp.where(valid, out_t + out_dt, 0.0), axis=1)
    t_last = jnp.where(n > 0, last_t, jnp.where(hit, T[:, -1], tmax))
    exhausted = (nocc > K) & hit
    return batch, MarchAux(t_last=t_last, saturated=saturated, exhausted=exhausted)


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
