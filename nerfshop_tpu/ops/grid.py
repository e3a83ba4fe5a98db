"""Occupancy / density grid maintenance.

Re-design of the reference's density-grid pipeline
(src/testbed_nerf.cu:3430-3657 ``update_density_grid_nerf``,
src/common_nerf.cu ``generate_grid_samples_nerf_nonuniform``,
``splat_grid_samples_nerf_max_nearest_neighbor``, ``ema_grid_samples_nerf``,
``grid_to_bitfield``, ``bitfield_max_pool``) as pure-functional JAX:

* density grid: ``[C, R, R, R]`` float32, EMA of density-MLP samples
  (``new = max(old * decay, sample)``, decay 0.95);
* occupancy bitfield: ``[C, R, R, R]`` bool = density > min(mean, 0.01),
  with each coarser cascade OR-ing in a 2× max-pool of the finer one
  (finer cascade occupies the center octant of the coarser);
* sampling: warm-up refreshes every cell; steady-state refreshes a random
  quarter of cells uniformly plus a quarter biased to occupied cells.

All updates are scatter/reduce ops on dense arrays — no atomics, no host
round-trips; jit-safe with static shapes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from nerfshop_tpu.common import (
    DENSITY_GRID_DECAY,
    GRID_RESOLUTION,
    NERF_MIN_OPTICAL_THICKNESS,
)
from nerfshop_tpu.ops import coords

R = GRID_RESOLUTION


class OccupancyGrid(NamedTuple):
    """Pytree state of the cascaded density/occupancy grid."""

    density: jnp.ndarray  # [C, R, R, R] float32, EMA'd density (post-activation)
    occupancy: jnp.ndarray  # [C, R, R, R] bool
    mean_density: jnp.ndarray  # [] float32

    @property
    def n_cascades(self) -> int:
        return self.density.shape[0]

    @staticmethod
    def create(n_cascades: int) -> "OccupancyGrid":
        return OccupancyGrid(
            density=jnp.zeros((n_cascades, R, R, R), jnp.float32),
            occupancy=jnp.ones((n_cascades, R, R, R), jnp.bool_),
            mean_density=jnp.zeros((), jnp.float32),
        )


def cell_world_positions(cell_idx: jnp.ndarray, mip: jnp.ndarray, jitter: jnp.ndarray) -> jnp.ndarray:
    """(ix,iy,iz) cells of cascade ``mip`` + jitter in [0,1)³ → warped [0,1]³
    position (the inverse of :func:`coords.cascaded_grid_coords`)."""
    p = (cell_idx.astype(jnp.float32) + jitter) / R  # in cascade-local [0,1]
    scale = jnp.exp2(mip.astype(jnp.float32))[..., None]
    return (p - 0.5) * scale + 0.5


def ema_update(density: jnp.ndarray, fresh: jnp.ndarray, sampled: jnp.ndarray, decay: float = DENSITY_GRID_DECAY) -> jnp.ndarray:
    """EMA with max-splat semantics: EVERY cell decays each update and
    sampled cells additionally take max with their fresh density
    (reference: ema_grid_samples_nerf runs over the whole grid,
    testbed_nerf.cu:483 — the universal decay is what eventually clears
    stale occupancy; decaying only sampled cells deadlocks a dense grid)."""
    return jnp.maximum(density * decay, jnp.where(sampled, fresh, 0.0))


def _slab_positions(n_cascades_active: int, z_lo: jnp.ndarray, z_size: int, rng: jax.Array) -> jnp.ndarray:
    """Jittered world positions of every cell in the z-slab
    [z_lo, z_lo+z_size) of every active cascade → [C·R·R·z_size, 3]."""
    ix, iy, iz = jnp.meshgrid(
        jnp.arange(R, dtype=jnp.int32),
        jnp.arange(R, dtype=jnp.int32),
        jnp.arange(z_size, dtype=jnp.int32),
        indexing="ij",
    )
    cells_one = jnp.stack([ix, iy, iz + z_lo], -1).reshape(-1, 3)  # [R·R·z, 3]
    cells = jnp.tile(cells_one, (n_cascades_active, 1))
    mips = jnp.repeat(jnp.arange(n_cascades_active, dtype=jnp.int32), R * R * z_size)
    jitter = jax.random.uniform(rng, cells.shape)
    return cell_world_positions(cells, mips, jitter)


def update_density_grid(
    grid: OccupancyGrid,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    rng: jax.Array,
    n_cascades_active: int,
    n_samples_per_cascade: int = 0,  # kept for API compat; slab size derives from it
    full_refresh: bool = False,
) -> OccupancyGrid:
    """One density-grid maintenance step — scatter-free TPU redesign.

    The reference splats randomly-sampled cells with atomics
    (splat_grid_samples_nerf_max_nearest_neighbor, testbed_nerf.cu:429);
    random scatters are a compile-time and runtime pathology on TPU, so
    instead each update refreshes a contiguous, meshgrid-ordered region and
    the fresh densities RESHAPE directly into the grid:

    * ``full_refresh`` (warm-up): every cell of every active cascade;
    * steady state: a rolling z-slab of thickness R/4 per cascade, slab
      offset chosen by rng — every cell revisits once per ~4 updates
      (matching the reference's ¼-of-cells-per-update cadence).

    ``density_fn`` maps WORLD (ngp-convention) positions [N,3] → activated
    density [N]; callers compose warp_position + network inside it.
    """
    C = grid.n_cascades
    k_slab, k_jit = jax.random.split(rng)
    z_size = R if full_refresh else R // 4
    if full_refresh:
        z_lo = jnp.zeros((), jnp.int32)
    else:
        z_lo = jax.random.randint(k_slab, (), 0, R // z_size) * z_size

    pos = _slab_positions(n_cascades_active, z_lo, z_size, k_jit)

    # evaluate the density MLP in bounded chunks (a full refresh is C·128³
    # positions — one giant call would blow HBM on the hash-encoding
    # intermediates; lax.map compiles the body once and loops)
    chunk = 1 << 17
    n = pos.shape[0]
    n_pad = (-n) % chunk
    pos_p = jnp.concatenate([pos, jnp.zeros((n_pad, 3), pos.dtype)]) if n_pad else pos
    sigma = jax.lax.map(density_fn, pos_p.reshape(-1, chunk, 3)).reshape(-1)[:n]
    fresh = sigma.astype(jnp.float32).reshape(n_cascades_active, R, R, z_size)

    # dense in-place slab update (dynamic_update_slice — no scatter)
    old_slab = jax.lax.dynamic_slice(
        grid.density,
        (0, 0, 0, z_lo),
        (n_cascades_active, R, R, z_size),
    )
    # fresh < 0 is the operator-kill sentinel (make_density_fn): clear hard
    new_slab = jnp.where(fresh < 0, 0.0, jnp.maximum(old_slab * DENSITY_GRID_DECAY, fresh))
    # EVERY cell decays each update (ema_grid_samples_nerf runs over the
    # whole grid, testbed_nerf.cu:483) — this is what eventually clears
    # stale occupancy; the refreshed slab additionally takes its fresh max
    new_density = jax.lax.dynamic_update_slice(
        grid.density * DENSITY_GRID_DECAY, new_slab, (0, 0, 0, z_lo)
    )
    return grid._replace(density=new_density)


def update_bitfield(grid: OccupancyGrid) -> OccupancyGrid:
    """Recompute mean density, threshold, and the cascaded bitfield
    (reference: update_density_grid_mean_and_bitfield testbed_nerf.cu:3642).

    The reference's grid stores OPTICAL THICKNESS σ·Δmin (Δmin = the minimal
    cone step √3/1024, splat_grid_samples_nerf_max_nearest_neighbor) and
    thresholds that against min(mean, 0.01). Ours stores activated σ
    directly, so the 0.01 cutoff converts to σ > 0.01/Δmin ≈ 5.9 —
    thresholding raw σ at 0.01 instead marks hazy free space occupied
    (measured: 97% occupancy on a trained fox vs the reference's few %),
    which defeats empty-space skipping and tile culling entirely."""
    from nerfshop_tpu.common import MIN_CONE_STEPSIZE

    mean = jnp.mean(jnp.maximum(grid.density, 0.0))
    thresh = jnp.minimum(mean, NERF_MIN_OPTICAL_THICKNESS / MIN_CONE_STEPSIZE)
    occ = grid.density > thresh

    # OR the 2x-max-pooled finer cascade into the center octant of the next
    # coarser cascade (bitfield_max_pool semantics).
    C = grid.n_cascades
    levels = [occ[0]]
    for k in range(1, C):
        fine = levels[k - 1]
        pooled = fine.reshape(R // 2, 2, R // 2, 2, R // 2, 2).any(axis=(1, 3, 5))
        lo, hi = R // 4, R // 4 + R // 2
        merged = occ[k].at[lo:hi, lo:hi, lo:hi].max(pooled)
        levels.append(merged)
    occupancy = jnp.stack(levels)
    return grid._replace(occupancy=occupancy, mean_density=mean)


def occupancy_at(grid: OccupancyGrid, pos: jnp.ndarray, mip: jnp.ndarray) -> jnp.ndarray:
    """Occupancy lookup at warped positions [..., 3] with per-point mip."""
    cell = coords.cascaded_grid_coords(pos, mip)
    return grid.occupancy[mip, cell[..., 0], cell[..., 1], cell[..., 2]]


def density_at(grid: OccupancyGrid, pos: jnp.ndarray, mip: jnp.ndarray) -> jnp.ndarray:
    cell = coords.cascaded_grid_coords(pos, mip)
    return grid.density[mip, cell[..., 0], cell[..., 1], cell[..., 2]]


def mark_untrained_cells(
    grid: OccupancyGrid,
    cam_positions: jnp.ndarray,  # [n_images, 3]
    cam_forward: jnp.ndarray,  # [n_images, 3]
    focal: jnp.ndarray,  # [n_images, 2]
    resolution: jnp.ndarray,  # [n_images, 2]
) -> jnp.ndarray:
    """Which cells are seen by at least one training camera
    (reference: mark_untrained_density_grid testbed_nerf.cu:353).
    Returns a [C,R,R,R] bool mask of *trained* cells; callers AND it into
    the density before thresholding. Approximate frustum test: the cell
    center must project within the image bounds of some camera."""
    C = grid.n_cascades
    ix, iy, iz = jnp.meshgrid(*(jnp.arange(R, dtype=jnp.int32),) * 3, indexing="ij")
    cells = jnp.stack([ix, iy, iz], -1).reshape(-1, 3)
    mips = jnp.repeat(jnp.arange(C, dtype=jnp.int32)[:, None], R**3, 1).reshape(-1)
    centers = cell_world_positions(jnp.tile(cells, (C, 1)), mips, jnp.full((C * R**3, 3), 0.5))
    # a cell is "seen" if ANY part of it projects inside some image — test
    # the center against the frustum expanded by the cell's bounding radius
    # (center-only culling clips content at frustum edges)
    radius = jnp.exp2(mips.astype(jnp.float32)) * (jnp.sqrt(3.0) / (2 * R))

    def seen_by_cam(cam_p, cam_f, f, res):
        v = centers - cam_p  # [N,3]
        z = jnp.einsum("nd,d->n", v, cam_f)
        # within FOV (conservative: max half-angle) + cell bounding sphere
        half_tan = jnp.maximum(res[0] / (2 * f[0]), res[1] / (2 * f[1]))
        lateral = jnp.linalg.norm(v - z[:, None] * cam_f, axis=-1)
        return (z > -radius) & (lateral <= z * half_tan * 1.2 + radius)

    seen = jax.vmap(seen_by_cam)(cam_positions, cam_forward, focal, resolution)
    return seen.any(axis=0).reshape(C, R, R, R)
