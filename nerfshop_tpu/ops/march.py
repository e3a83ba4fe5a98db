"""Occupancy-guided ray marching, restructured for XLA/TPU.

TPU-native redesign of the reference's ragged CUDA march
(src/testbed_nerf.cu:1087-1253 ``generate_training_samples_nerf``, 637
``generate_next_nerf_network_inputs``, src/common_nerf.cu
``advance_to_next_voxel``). The CUDA code walks each ray sequentially with
per-thread loops, DDA voxel skipping, atomic sample budgets and host-synced
compaction. None of that maps to the TPU: gathers over the whole candidate
set are nearly free (measured ~0.06 ms for 8M lookups) while sequential
``while_loop`` iterations with scatters cost ~1 ms each. So the march is
ONE SHOT:

1. **Closed-form step ladder.** The reference's ``t += clamp(t·cone, dt_min,
   dt_max)`` recurrence has an exact closed form in three segments (linear
   at dt_min → geometric ×(1+cone) → linear at dt_max); candidate positions
   ``T[r, m]`` for m = 0..M−1 are computed directly, no loop.
2. **One occupancy gather** over all [R, M] candidates (cascade/mip chosen
   per candidate exactly like mip_from_dt).
3. **Transmittance proxy** (optional): a second gather of the density grid
   gives a conservative optical-depth cumsum used for early termination at
   render time (the analog of the trace loop's T < ε break).
4. **Cumsum compaction**: ranks = cumsum(occupied); the first K occupied
   candidates per ray scatter (one scatter) into the fixed [R, K] slab.

Sampling semantics match the reference: samples are the ladder points whose
cascade cell is occupied, capped at K per ray, jittered start, near-plane
clamp. Empty space costs one gathered bit instead of a DDA loop.
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


@partial(
    jax.jit,
    static_argnames=("k_samples", "n_candidates", "use_grid_early_stop"),
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
    k_samples: int = 32,
    n_candidates: int = 1024,
    density_grid: Optional[jnp.ndarray] = None,
    use_grid_early_stop: bool = False,
    grid_stop_tau: float = 12.0,
) -> SampleBatch:
    R = origins.shape[0]
    K = k_samples
    M = n_candidates
    n_cascades = occupancy.shape[0]
    aabb = BoundingBox(aabb_lo, aabb_hi)

    tmin, tmax = aabb.ray_intersect(origins, directions)
    tmin = jnp.maximum(tmin, t_start_min)
    hit = tmin < tmax
    t0 = jnp.where(hit, tmin, tmax)
    if t_jitter is not None:
        t0 = t0 + coords.calc_dt(t0, cone_angle) * t_jitter

    T, dt = step_ladder(t0, jnp.arange(M, dtype=jnp.int32), cone_angle)  # [R,M]
    inside = T < tmax[:, None]

    # candidate cell coords per coordinate axis — [R, M] each, fused by XLA
    # Cascade/occupancy space is WORLD space (ngp convention: cascade k is a
    # side-2^k cube centered at (0.5,)³ — common_nerf.cu cascaded_grid_idx_at).
    px = origins[:, 0:1] + T * directions[:, 0:1]
    py = origins[:, 1:2] + T * directions[:, 1:2]
    pz = origins[:, 2:3] + T * directions[:, 2:3]

    # mip_from_dt: cascade from position extent, coarsened by step width
    maxval = jnp.maximum(jnp.maximum(jnp.abs(px - 0.5), jnp.abs(py - 0.5)), jnp.abs(pz - 0.5))
    mip_pos = jnp.clip(
        jnp.floor(jnp.log2(jnp.maximum(maxval, 1e-12))).astype(jnp.int32) + 2, 0, n_cascades - 1
    )
    d_scaled = dt * (2 * GRID_RESOLUTION)
    expo = jnp.floor(jnp.log2(jnp.maximum(d_scaled, 1e-12))).astype(jnp.int32) + 1
    mip = jnp.where(
        d_scaled < 1.0, mip_pos, jnp.clip(jnp.maximum(expo, mip_pos), 0, n_cascades - 1)
    )

    mip_scale = jnp.exp2(-mip.astype(jnp.float32))
    Rg = GRID_RESOLUTION

    def cell_of(p):
        q = (p - 0.5) * mip_scale + 0.5
        return jnp.clip(jnp.floor(q * Rg).astype(jnp.int32), 0, Rg - 1)

    ix, iy, iz = cell_of(px), cell_of(py), cell_of(pz)
    flat = ((mip * Rg + ix) * Rg + iy) * Rg + iz  # [R, M]

    # materialize the indices before gathering: without the barrier XLA fuses
    # the whole index computation into (multiple) gather consumers and the
    # fused kernel is ~50× slower than gather-from-materialized-indices
    flat = jax.lax.optimization_barrier(flat)
    occ = jnp.take(occupancy.reshape(-1), flat, axis=0) & inside  # one gather
    occ = jax.lax.optimization_barrier(occ)

    if use_grid_early_stop and density_grid is not None:
        dens = jnp.take(density_grid.reshape(-1), flat, axis=0)
        tau = jnp.cumsum(jnp.where(occ, dens * dt, 0.0), axis=1)
        occ &= (tau - dens * dt) < grid_stop_tau  # exclusive cumsum test

    # compaction: first K occupied candidates → [R, K] slots. ``rank`` is
    # monotone along M, so the k-th occupied index is a binary search —
    # scatter-free (TPU scatters cost ~100× a gather of the same size).
    # top_k over a monotone score picks the first K occupied candidates in
    # order (occupied scores M−m > 0 > −m unoccupied): scatter-free and
    # without the [R,M,K] blow-up of a searchsorted/count formulation.
    ms = jnp.arange(M, dtype=jnp.int32)[None, :]
    score = jnp.where(occ, M - ms, -ms)
    _, idx = jax.lax.top_k(score, K)  # [R, K], m ascending among occupied
    out_t = jnp.take_along_axis(T, idx, axis=1)
    out_dt = jnp.take_along_axis(dt, idx, axis=1)

    n = jnp.minimum(jnp.sum(occ.astype(jnp.int32), axis=1), K)
    n = jnp.where(hit, n, 0)
    valid = jnp.arange(K, dtype=jnp.int32)[None, :] < n[:, None]
    out_t = jnp.where(valid, out_t, 0.0)
    out_dt = jnp.where(valid, out_dt, 0.0)
    return SampleBatch(t=out_t, dt=out_dt, valid=valid, n=n)


@partial(jax.jit, static_argnames=("k_samples", "n_steps", "use_grid_early_stop"))
def march_rays_skip(
    origins: jnp.ndarray,  # [R, 3] world
    directions: jnp.ndarray,  # [R, 3] unit
    skip_field: jnp.ndarray,  # [C, R, R, R] int32 chebyshev dist-to-occupied
    aabb_lo: jnp.ndarray,
    aabb_hi: jnp.ndarray,
    cone_angle: jnp.ndarray,
    t_jitter: Optional[jnp.ndarray] = None,
    t_start_min: float = 0.0,
    k_samples: int = 32,
    n_steps: int = 96,
    density_grid: Optional[jnp.ndarray] = None,
    use_grid_early_stop: bool = False,
    grid_stop_tau: float = 12.0,
) -> SampleBatch:
    """Skip-field march: the production sampler.

    Each of ``n_steps`` scan iterations does ONE [R] skip-field lookup per
    ray: distance 0 → emit a sample and step dt; distance d>0 → jump
    (d−1) cells of that cascade (the chebyshev ball is guaranteed empty).
    Total lookups = R·n_steps ≈ 10× fewer than checking every ladder
    candidate — the knob that matters, since TPU random gathers are
    tile-granular. Emissions accumulate as scan outputs (no scatters);
    one top_k compacts them into the [R, K] slab."""
    R_ = origins.shape[0]
    K = k_samples
    n_cascades = skip_field.shape[0]
    aabb = BoundingBox(aabb_lo, aabb_hi)
    Rg = GRID_RESOLUTION

    tmin, tmax = aabb.ray_intersect(origins, directions)
    tmin = jnp.maximum(tmin, t_start_min)
    hit = tmin < tmax
    t0 = jnp.where(hit, tmin, tmax)
    if t_jitter is not None:
        t0 = t0 + coords.calc_dt(t0, cone_angle) * t_jitter

    flat_skip = skip_field.reshape(-1)
    flat_dens = density_grid.reshape(-1) if density_grid is not None else None

    def body(carry, _):
        t, tau = carry
        dt = coords.calc_dt(t, cone_angle)
        px = origins[:, 0] + t * directions[:, 0]
        py = origins[:, 1] + t * directions[:, 1]
        pz = origins[:, 2] + t * directions[:, 2]
        maxval = jnp.maximum(jnp.maximum(jnp.abs(px - 0.5), jnp.abs(py - 0.5)), jnp.abs(pz - 0.5))
        mip_pos = jnp.clip(
            jnp.floor(jnp.log2(jnp.maximum(maxval, 1e-12))).astype(jnp.int32) + 2, 0, n_cascades - 1
        )
        dsc = dt * (2 * Rg)
        expo = jnp.floor(jnp.log2(jnp.maximum(dsc, 1e-12))).astype(jnp.int32) + 1
        mip = jnp.where(dsc < 1.0, mip_pos, jnp.clip(jnp.maximum(expo, mip_pos), 0, n_cascades - 1))
        ms = jnp.exp2(-mip.astype(jnp.float32))

        def cell_of(p):
            return jnp.clip(jnp.floor(((p - 0.5) * ms + 0.5) * Rg).astype(jnp.int32), 0, Rg - 1)

        flat = ((mip * Rg + cell_of(px)) * Rg + cell_of(py)) * Rg + cell_of(pz)
        d = jnp.take(flat_skip, flat, axis=0)  # [R] — the one gather
        inside = t < tmax
        occupied = (d == 0) & inside

        if use_grid_early_stop and flat_dens is not None:
            dens = jnp.take(flat_dens, flat, axis=0)
            new_tau = tau + jnp.where(occupied, dens * dt, 0.0)
            occupied &= tau < grid_stop_tau
        else:
            new_tau = tau

        cell_w = jnp.exp2(mip.astype(jnp.float32)) / Rg  # world cell width
        jump = jnp.maximum((d - 1).astype(jnp.float32), 0.0) * cell_w
        t_next = t + jnp.maximum(dt, jump)
        return (t_next, new_tau), (t, dt, occupied)

    (_, _), (ts, dts, occs) = jax.lax.scan(
        body, (t0, jnp.zeros(R_, jnp.float32)), None, length=n_steps
    )
    ts = ts.T  # [R, S]
    dts = dts.T
    occs = occs.T

    S = n_steps
    ssi = jnp.arange(S, dtype=jnp.int32)[None, :]
    score = jnp.where(occs, S - ssi, -ssi)
    _, idx = jax.lax.top_k(score, K)
    out_t = jnp.take_along_axis(ts, idx, axis=1)
    out_dt = jnp.take_along_axis(dts, idx, axis=1)
    n = jnp.minimum(jnp.sum(occs.astype(jnp.int32), axis=1), K)
    n = jnp.where(hit, n, 0)
    valid = jnp.arange(K, dtype=jnp.int32)[None, :] < n[:, None]
    return SampleBatch(
        t=jnp.where(valid, out_t, 0.0),
        dt=jnp.where(valid, out_dt, 0.0),
        valid=valid,
        n=n,
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
