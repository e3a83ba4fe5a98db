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
    #: chebyshev distance (in cells, capped) to the nearest occupied cell;
    #: 0 = occupied. Lets the march jump (d−1) cells per lookup — the
    #: TPU answer to per-step DDA skipping (random HBM gathers are
    #: tile-granular, so fewer lookups beat cheaper lookups).
    skip: jnp.ndarray = None  # [C, R, R, R] int32

    @property
    def n_cascades(self) -> int:
        return self.density.shape[0]

    @staticmethod
    def create(n_cascades: int) -> "OccupancyGrid":
        return OccupancyGrid(
            density=jnp.zeros((n_cascades, R, R, R), jnp.float32),
            occupancy=jnp.ones((n_cascades, R, R, R), jnp.bool_),
            mean_density=jnp.zeros((), jnp.float32),
            skip=jnp.zeros((n_cascades, R, R, R), jnp.int32),
        )


MAX_SKIP = 15


def skip_field_from_occupancy(occ: jnp.ndarray, max_skip: int = MAX_SKIP) -> jnp.ndarray:
    """[C,R,R,R] bool → capped chebyshev distance-to-occupied [C,R,R,R] int32.

    Iterative separable 3-tap min along x/y/z grows a chebyshev ball one
    cell per iteration — max_skip cheap dense passes on the VPU."""
    d = jnp.where(occ, 0, max_skip).astype(jnp.int32)

    def one_iter(d, _):
        e = d
        for axis in (1, 2, 3):
            lo = jnp.roll(e, 1, axis=axis)
            hi = jnp.roll(e, -1, axis=axis)
            # roll wraps; edges are conservative anyway (clamped by +1 below)
            e = jnp.minimum(e, jnp.minimum(lo, hi))
        return jnp.minimum(d, e + 1), None

    d, _ = jax.lax.scan(one_iter, d, None, length=max_skip)
    return d


def cell_world_positions(cell_idx: jnp.ndarray, mip: jnp.ndarray, jitter: jnp.ndarray) -> jnp.ndarray:
    """(ix,iy,iz) cells of cascade ``mip`` + jitter in [0,1)³ → warped [0,1]³
    position (the inverse of :func:`coords.cascaded_grid_coords`)."""
    p = (cell_idx.astype(jnp.float32) + jitter) / R  # in cascade-local [0,1]
    scale = jnp.exp2(mip.astype(jnp.float32))[..., None]
    return (p - 0.5) * scale + 0.5


def splat_max(density: jnp.ndarray, cells: jnp.ndarray, mips: jnp.ndarray, values: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Scatter-max ``values`` into [C,R,R,R] at (mip, ix, iy, iz); invalid
    entries are dropped (scatter with out-of-bounds index)."""
    c = jnp.where(valid, mips, density.shape[0])  # OOB mip → dropped
    return density.at[c, cells[..., 0], cells[..., 1], cells[..., 2]].max(
        values, mode="drop"
    )


def ema_update(density: jnp.ndarray, splatted: jnp.ndarray, decay: float = DENSITY_GRID_DECAY) -> jnp.ndarray:
    """EMA with max-splat semantics: cells that received a fresh sample take
    max(old*decay, new); untouched cells keep their value until resampled.

    The reference decays only sampled cells (the splat buffer starts as a
    copy and ema takes max(grid*decay, tmp)); we mirror that by decaying
    exactly where a sample landed (splatted >= 0 marker)."""
    sampled = splatted >= 0.0
    return jnp.where(sampled, jnp.maximum(density * decay, splatted), density)


def update_density_grid(
    grid: OccupancyGrid,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    rng: jax.Array,
    n_cascades_active: int,
    n_samples_per_cascade: int,
    full_refresh: bool,
) -> OccupancyGrid:
    """One density-grid maintenance step.

    ``density_fn`` maps WORLD (ngp-convention) positions [N,3] → activated
    density [N]; callers compose ``warp_position`` + network inside it.
    ``full_refresh`` (warm-up, reference: first 256 steps) samples every cell;
    otherwise a uniform quarter plus an occupied-biased quarter.
    """
    C = grid.n_cascades
    k_cells, k_jit, k_sel = jax.random.split(rng, 3)

    if full_refresh:
        ix, iy, iz = jnp.meshgrid(*(jnp.arange(R, dtype=jnp.int32),) * 3, indexing="ij")
        cells_one = jnp.stack([ix, iy, iz], -1).reshape(-1, 3)  # [R^3, 3]
        cells = jnp.tile(cells_one, (n_cascades_active, 1))
        mips = jnp.repeat(jnp.arange(n_cascades_active, dtype=jnp.int32), R**3)
        valid = jnp.ones(cells.shape[0], jnp.bool_)
    else:
        n = n_samples_per_cascade * n_cascades_active
        half = n // 2
        cells = jax.random.randint(k_cells, (n, 3), 0, R, jnp.int32)
        mips = jax.random.randint(k_sel, (n,), 0, n_cascades_active, jnp.int32)
        occ_here = grid.occupancy[mips, cells[:, 0], cells[:, 1], cells[:, 2]]
        # first half: unconditional uniform refresh; second half: only
        # occupied cells survive — an occupancy-biased refresh that plays the
        # role of the reference's importance-sampled half.
        valid = jnp.concatenate(
            [jnp.ones(half, jnp.bool_), occ_here[half:]], axis=0
        )

    jitter = jax.random.uniform(k_jit, cells.shape)
    pos = cell_world_positions(cells, mips, jitter)

    # evaluate the density MLP in bounded chunks (a full refresh is C·128³
    # positions — one giant call would blow HBM on the hash-encoding
    # intermediates; lax.map compiles the body once and loops)
    chunk = 1 << 17
    n = pos.shape[0]
    n_pad = (-n) % chunk
    pos_p = jnp.concatenate([pos, jnp.zeros((n_pad, 3), pos.dtype)]) if n_pad else pos
    sigma = jax.lax.map(density_fn, pos_p.reshape(-1, chunk, 3)).reshape(-1)[:n]

    splatted = jnp.full_like(grid.density, -1.0)
    splatted = splat_max(splatted, cells, mips, sigma.astype(jnp.float32), valid)
    new_density = ema_update(grid.density, splatted)
    return grid._replace(density=new_density)


def update_bitfield(grid: OccupancyGrid) -> OccupancyGrid:
    """Recompute mean density, threshold, and the cascaded bitfield
    (reference: update_density_grid_mean_and_bitfield testbed_nerf.cu:3642)."""
    mean = jnp.mean(jnp.maximum(grid.density, 0.0))
    thresh = jnp.minimum(mean, NERF_MIN_OPTICAL_THICKNESS)
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
    return grid._replace(
        occupancy=occupancy,
        mean_density=mean,
        skip=skip_field_from_occupancy(occupancy),
    )


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

    def seen_by_cam(cam_p, cam_f, f, res):
        v = centers - cam_p  # [N,3]
        z = jnp.einsum("nd,d->n", v, cam_f)
        # in front of camera and within FOV (conservative: use max half-angle)
        half_tan = jnp.maximum(res[0] / (2 * f[0]), res[1] / (2 * f[1]))
        lateral = jnp.linalg.norm(v - z[:, None] * cam_f, axis=-1)
        return (z > 0) & (lateral <= z * half_tan * 1.2)

    seen = jax.vmap(seen_by_cam)(cam_positions, cam_forward, focal, resolution)
    return seen.any(axis=0).reshape(C, R, R, R)
