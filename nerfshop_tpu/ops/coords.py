"""Coordinate transforms, cascade (mip) indexing, morton codes.

Behavioral parity with the reference's device lib
(src/common_nerf.cu:5-180, include/neural-graphics-primitives/common_nerf.h),
re-expressed as vectorized JAX ops over ``[..., 3]`` arrays.

TPU-first divergence: the occupancy grid lives as ``[C, R, R, R]`` dense
arrays indexed by (ix, iy, iz) — not morton-ordered flat buffers — because
XLA gathers/scatters and ``reduce_window`` mips want natural 3D layout.
Morton encode/decode is provided for `.ingp` snapshot interop only.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nerfshop_tpu.common import (
    GRID_RESOLUTION,
    MIN_CONE_STEPSIZE,
    MAX_CONE_STEPSIZE,
)


class BoundingBox(NamedTuple):
    """Axis-aligned box; mirrors bounding_box.cuh semantics."""

    min: jnp.ndarray  # [3]
    max: jnp.ndarray  # [3]

    @staticmethod
    def unit() -> "BoundingBox":
        return BoundingBox(jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32))

    @staticmethod
    def from_aabb_scale(aabb_scale: float) -> "BoundingBox":
        """NeRF scene box: cube of side ``aabb_scale`` centered at 0.5
        (testbed.cu load_nerf: inflate(0.5*aabb_scale) around (0.5,)³)."""
        c = jnp.full((3,), 0.5, jnp.float32)
        h = jnp.full((3,), 0.5 * float(aabb_scale), jnp.float32)
        return BoundingBox(c - h, c + h)

    @property
    def diag(self) -> jnp.ndarray:
        return self.max - self.min

    def relative_pos(self, pos: jnp.ndarray) -> jnp.ndarray:
        return (pos - self.min) / self.diag

    def contains(self, pos: jnp.ndarray) -> jnp.ndarray:
        return jnp.all((pos >= self.min) & (pos <= self.max), axis=-1)

    def ray_intersect(self, origin: jnp.ndarray, direction: jnp.ndarray):
        """Slab test → (tmin, tmax); tmin>tmax means miss. Vectorized."""
        inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)
        t0 = (self.min - origin) * inv
        t1 = (self.max - origin) * inv
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return tmin, tmax


# --- position / direction / dt warps (common_nerf.cu:5-36) -----------------


def warp_position(pos: jnp.ndarray, aabb: BoundingBox) -> jnp.ndarray:
    """World → [0,1]³ network-input space."""
    return aabb.relative_pos(pos)


def unwarp_position(pos: jnp.ndarray, aabb: BoundingBox) -> jnp.ndarray:
    return aabb.min + pos * aabb.diag


def warp_direction(direction: jnp.ndarray) -> jnp.ndarray:
    return (direction + 1.0) * 0.5


def unwarp_direction(direction: jnp.ndarray) -> jnp.ndarray:
    return direction * 2.0 - 1.0


def warp_dt(dt: jnp.ndarray, n_cascades: int) -> jnp.ndarray:
    max_stepsize = MIN_CONE_STEPSIZE * (1 << (n_cascades - 1))
    return (dt - MIN_CONE_STEPSIZE) / (max_stepsize - MIN_CONE_STEPSIZE)


def unwarp_dt(dt: jnp.ndarray, n_cascades: int) -> jnp.ndarray:
    max_stepsize = MIN_CONE_STEPSIZE * (1 << (n_cascades - 1))
    return dt * (max_stepsize - MIN_CONE_STEPSIZE) + MIN_CONE_STEPSIZE


# --- stepping (common_nerf.cu:80-115) ---------------------------------------


def calc_cone_angle(cosine: jnp.ndarray, focal_y: jnp.ndarray, cone_angle_constant: float) -> jnp.ndarray:
    """Pixel-footprint-matched cone angle; 0 inside unit box (cosine>...)."""
    return jnp.minimum(cosine / focal_y, cone_angle_constant)


def calc_dt(t: jnp.ndarray, cone_angle: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(t * cone_angle, MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE)


def distance_to_next_voxel(pos: jnp.ndarray, direction: jnp.ndarray, inv_dir: jnp.ndarray, res) -> jnp.ndarray:
    """DDA distance from ``pos`` to the next voxel boundary of a res³ grid
    over [0,1]³. ``res`` may be per-element (mip-dependent)."""
    p = res[..., None] * pos if jnp.ndim(res) else res * pos
    bound = jnp.floor(p + 0.5 + 0.5 * jnp.sign(direction))
    t = jnp.min((bound - p) * inv_dir, axis=-1)
    r = res if jnp.ndim(res) else jnp.asarray(res, pos.dtype)
    return jnp.maximum(t / r, 0.0)


# --- cascade / mip indexing (common_nerf.cu:117-180) ------------------------


def mip_from_pos(pos: jnp.ndarray, n_cascades: int) -> jnp.ndarray:
    """Cascade that covers ``pos``: cascade k spans a cube of side 2^k
    centered at 0.5. Equivalent to the reference's frexp construction."""
    maxval = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    exponent = jnp.floor(jnp.log2(jnp.maximum(maxval, 1e-12))).astype(jnp.int32) + 2
    return jnp.clip(exponent, 0, n_cascades - 1)


def mip_from_dt(dt: jnp.ndarray, pos: jnp.ndarray, n_cascades: int) -> jnp.ndarray:
    """Coarsen the cascade when the step is wider than a fine cell."""
    mip = mip_from_pos(pos, n_cascades)
    d = dt * (2 * GRID_RESOLUTION)
    # frexp exponent of d (for d >= 1): floor(log2(d)) + 1
    expo = jnp.floor(jnp.log2(jnp.maximum(d, 1e-12))).astype(jnp.int32) + 1
    coarse = jnp.clip(jnp.maximum(expo, mip), 0, n_cascades - 1)
    return jnp.where(d < 1.0, mip, coarse)


def cascaded_grid_coords(pos: jnp.ndarray, mip: jnp.ndarray) -> jnp.ndarray:
    """``pos`` in [0,1]³-warped space → integer cell coords (ix,iy,iz) of the
    given cascade, clamped to [0, R-1]. Cascade ``mip`` re-centers a cube of
    side 2^mip at 0.5 onto the full grid."""
    mip_scale = jnp.exp2(-mip.astype(pos.dtype))[..., None]
    p = (pos - 0.5) * mip_scale + 0.5
    i = jnp.floor(p * GRID_RESOLUTION).astype(jnp.int32)
    return jnp.clip(i, 0, GRID_RESOLUTION - 1)


# --- morton (snapshot interop with the reference's grid layout) -------------


def _u32(v: int) -> jnp.ndarray:
    import numpy as _np

    return jnp.asarray(_np.uint32(v))


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & _u32(0x000003FF)
    x = (x ^ (x << 16)) & _u32(0xFF0000FF)
    x = (x ^ (x << 8)) & _u32(0x0300F00F)
    x = (x ^ (x << 4)) & _u32(0x030C30C3)
    x = (x ^ (x << 2)) & _u32(0x09249249)
    return x


def _compact1by2(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & _u32(0x09249249)
    x = (x ^ (x >> 2)) & _u32(0x030C30C3)
    x = (x ^ (x >> 4)) & _u32(0x0300F00F)
    x = (x ^ (x >> 8)) & _u32(0xFF0000FF)
    x = (x ^ (x >> 16)) & _u32(0x000003FF)
    return x


def morton3d(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    return (_part1by2(z) << 2 | _part1by2(y) << 1 | _part1by2(x)).astype(jnp.uint32)


def morton3d_invert(code: jnp.ndarray):
    code = code.astype(jnp.uint32)
    return _compact1by2(code), _compact1by2(code >> 1), _compact1by2(code >> 2)


def morton_to_dense_grid(flat_mip: jnp.ndarray) -> jnp.ndarray:
    """[R³] morton-ordered values → dense [R,R,R] (index order x,y,z)."""
    r = GRID_RESOLUTION
    codes = jnp.arange(r**3, dtype=jnp.uint32)
    x, y, z = morton3d_invert(codes)
    dense = jnp.zeros((r, r, r), flat_mip.dtype)
    return dense.at[x.astype(jnp.int32), y.astype(jnp.int32), z.astype(jnp.int32)].set(flat_mip)


def dense_grid_to_morton(dense: jnp.ndarray) -> jnp.ndarray:
    r = GRID_RESOLUTION
    codes = jnp.arange(r**3, dtype=jnp.uint32)
    x, y, z = morton3d_invert(codes)
    return dense[x.astype(jnp.int32), y.astype(jnp.int32), z.astype(jnp.int32)]
