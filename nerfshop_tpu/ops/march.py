"""Occupancy-guided ray marching, restructured for XLA.

This is the TPU-native redesign of the reference's ragged CUDA march
(src/testbed_nerf.cu:1087-1253 ``generate_training_samples_nerf``, 637
``generate_next_nerf_network_inputs``, src/common_nerf.cu
``advance_to_next_voxel``): instead of per-thread dynamic loops with atomic
sample budgets and host-synced compaction, every ray owns a fixed slab of
``K`` sample slots and a ``lax.while_loop`` advances all rays in lockstep,
``W`` ladder steps per iteration, writing accepted samples with vectorized
scatters. No host syncs, fully static shapes, one compiled program.

Semantics preserved:

* step ladder: ``t += dt`` with ``dt = clamp(t·cone_angle, dt_min, dt_max)``
  (cone-angle footprint matching, common_nerf.cu calc_dt);
* empty cells skipped by DDA: jump to the next voxel boundary of the
  cascade's grid, rounded up to the ladder
  (``t += max(ceil(dist/dt), 1)·dt`` — the closed form of
  advance_to_next_voxel);
* per-sample cascade from ``mip_from_dt`` so far samples land in coarse
  cascades;
* start jitter decorrelates the ladder across rays (training).

The sampler is shared by training and rendering; an optional transmittance
proxy from the density grid can terminate saturated rays early.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfshop_tpu.common import GRID_RESOLUTION
from nerfshop_tpu.ops import coords
from nerfshop_tpu.ops import grid as grid_lib
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


@partial(
    jax.jit,
    static_argnames=("k_samples", "steps_per_iter", "max_iters", "use_grid_early_stop"),
)
def march_rays(
    origins: jnp.ndarray,  # [R, 3] world
    directions: jnp.ndarray,  # [R, 3] unit
    occupancy: jnp.ndarray,  # [C, R, R, R] bool
    aabb_lo: jnp.ndarray,  # [3]
    aabb_hi: jnp.ndarray,  # [3]
    cone_angle: jnp.ndarray,  # [] or [R]
    t_jitter: Optional[jnp.ndarray] = None,  # [R] in [0,1) or None
    t_start_min: float = 0.0,
    k_samples: int = 32,
    steps_per_iter: int = 8,
    max_iters: int = 512,
    density_grid: Optional[jnp.ndarray] = None,
    use_grid_early_stop: bool = False,
    grid_stop_tau: float = 16.0,
) -> SampleBatch:
    R = origins.shape[0]
    K = k_samples
    n_cascades = occupancy.shape[0]
    aabb = BoundingBox(aabb_lo, aabb_hi)

    tmin, tmax = aabb.ray_intersect(origins, directions)
    tmin = jnp.maximum(tmin, t_start_min)
    hit = tmin < tmax
    t0 = jnp.where(hit, tmin, tmax)
    if t_jitter is not None:
        t0 = t0 + coords.calc_dt(t0, cone_angle) * t_jitter

    # Cascade/occupancy space is WORLD space (ngp convention: cascade k is a
    # side-2^k cube centered at (0.5,)³ — common_nerf.cu cascaded_grid_idx_at
    # takes unwarped positions). Warping to the full aabb happens only for
    # network inputs.
    inv_dir = 1.0 / jnp.where(jnp.abs(directions) < 1e-12, 1e-12, directions)

    def world(t):
        return origins + t[:, None] * directions

    def step_once(t, tau):
        """One ladder step for all rays: returns (next t, τ, sample fields)."""
        dt = coords.calc_dt(t, cone_angle)
        pos = world(t)
        mip = coords.mip_from_dt(dt, pos, n_cascades)
        cell = coords.cascaded_grid_coords(pos, mip)
        occ = occupancy[mip, cell[..., 0], cell[..., 1], cell[..., 2]]
        inside = t < tmax
        accept = occ & inside

        # DDA skip for empty cells: distance to the next voxel boundary of
        # this cascade (res = 128 >> mip cells per world unit), rounded up to
        # the dt ladder (closed form of advance_to_next_voxel).
        res = (GRID_RESOLUTION >> mip).astype(jnp.float32)
        p = pos * res[:, None]
        bound = jnp.floor(p + 0.5 + 0.5 * jnp.sign(directions))
        t_vox = jnp.min((bound - p) * inv_dir, axis=-1) / res
        t_vox = jnp.maximum(t_vox, 0.0)
        n_skip = jnp.maximum(jnp.ceil(t_vox / dt), 1.0)
        t_next = jnp.where(accept, t + dt, t + n_skip * dt)

        if use_grid_early_stop and density_grid is not None:
            dens = density_grid[mip, cell[..., 0], cell[..., 1], cell[..., 2]]
            tau = tau + jnp.where(accept, dens * dt, 0.0)
        return t_next, tau, (t, dt, accept)

    def cond(state):
        t, n, tau, it, _, _ = state
        alive = (t < tmax) & (n < K)
        if use_grid_early_stop:
            alive &= tau < grid_stop_tau
        return jnp.any(alive) & (it < max_iters)

    def body(state):
        t, n, tau, it, out_t, out_dt = state
        ts, dts, accs = [], [], []
        for _ in range(steps_per_iter):
            t, tau, (tc, dtc, acc) = step_once(t, tau)
            ts.append(tc)
            dts.append(dtc)
            accs.append(acc)
        ts = jnp.stack(ts, 1)  # [R, W]
        dts = jnp.stack(dts, 1)
        accs = jnp.stack(accs, 1)
        if use_grid_early_stop:
            # don't accept past saturation
            accs &= (tau < grid_stop_tau)[:, None]

        rank = jnp.cumsum(accs.astype(jnp.int32), axis=1)  # [R, W]
        slot = n[:, None] + rank - 1
        write = accs & (slot < K)
        slot = jnp.where(write, slot, K)  # K → dropped by scatter
        rows = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], slot.shape)
        out_t = out_t.at[rows, slot].set(ts, mode="drop")
        out_dt = out_dt.at[rows, slot].set(dts, mode="drop")
        n = jnp.minimum(n + rank[:, -1], K)
        return (t, n, tau, it + 1, out_t, out_dt)

    init = (
        t0,
        jnp.where(hit, 0, K).astype(jnp.int32),  # missed rays collect nothing
        jnp.zeros(R, jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((R, K), jnp.float32),
        jnp.zeros((R, K), jnp.float32),
    )
    t_fin, n_fin, tau, _, out_t, out_dt = jax.lax.while_loop(cond, body, init)

    n_fin = jnp.where(hit, n_fin, 0)
    valid = jnp.arange(K, dtype=jnp.int32)[None, :] < n_fin[:, None]
    return SampleBatch(t=out_t, dt=out_dt, valid=valid, n=n_fin)


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
