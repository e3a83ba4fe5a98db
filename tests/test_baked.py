"""Baked shear-warp renderer (render/baked.py) vs the exact per-sample
renderer on an analytic scene.

Oracle strategy (SURVEY §4): a constant-density ball has closed-form
transmittance, and both render paths consume the same field function, so
the baked fast path must reproduce the exact path up to voxelization and
bilinear-resampling error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.ops import coords, grid as grid_lib
from nerfshop_tpu.render import baked, renderer


class BallField:
    """σ = s0 inside a sphere, rgb = constant; duck-types NerfNetwork."""

    def __init__(self, center=(0.5, 0.5, 0.5), radius=0.22, sigma=24.0, rgb=(0.9, 0.55, 0.2)):
        self.center = jnp.asarray(center)
        self.radius = radius
        self.sigma0 = sigma
        self.rgb0 = jnp.asarray(rgb)

    def __call__(self, params, pos, dirs=None, extra=None):
        d = jnp.linalg.norm(pos - self.center, axis=-1)
        inside = (d < self.radius).astype(jnp.float32)
        sigma = inside * self.sigma0
        rgb = jnp.broadcast_to(self.rgb0, pos.shape[:-1] + (3,)) * jnp.ones_like(sigma)[..., None]
        return rgb, sigma

    def density(self, params, pos, activated=True):
        return self(params, pos)[1]


def _camera(dist=1.6, H=64, W=64):
    # camera at +z looking toward the box center (view dir -z)
    xform = jnp.asarray(
        [[-1.0, 0.0, 0.0, 0.5],
         [0.0, 1.0, 0.0, 0.5],
         [0.0, 0.0, -1.0, 0.5 + dist]],
        jnp.float32,
    )
    focal = jnp.asarray([W * 1.1, W * 1.1], jnp.float32)
    return xform, focal, (W, H)


def _ball_grid(field: BallField):
    grid = grid_lib.OccupancyGrid.create(1)
    g = (np.arange(128) + 0.5) / 128
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    occ = (
        (xx - field.center[0]) ** 2 + (yy - field.center[1]) ** 2 + (zz - field.center[2]) ** 2
    ) < (field.radius + 0.02) ** 2
    return grid._replace(
        occupancy=jnp.asarray(occ[None]),
        density=jnp.where(jnp.asarray(occ[None]), field.sigma0, 0.0),
    )


def test_baked_matches_exact_render():
    field = BallField()
    aabb = coords.BoundingBox.from_aabb_scale(1)
    xform, focal, (W, H) = _camera()

    vol = baked.bake_volume(field, {}, aabb, resolution=64, chunk=1 << 16)
    out_b = baked.render_baked(vol, (W, H), xform, focal, base_resolution=128)

    grid = _ball_grid(field)
    opts = renderer.RenderOptions(aabb_scale=1, chunk=4096, k_samples=32, n_windows=2)
    out_e = renderer.render_frame(field, {}, grid, (W, H), xform, focal, opts=opts)

    a = np.asarray(out_b.rgba[..., :3], np.float32)
    b = np.asarray(out_e.rgba[..., :3], np.float32)
    mse = float(np.mean((a - b) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-10))
    # voxelized ball edge + bilinear base-raster resampling vs exact march
    assert psnr > 24.0, f"baked-vs-exact PSNR {psnr:.2f}"

    # opacity at the center pixel matches the analytic ball transmittance
    alpha_b = float(out_b.rgba[H // 2, W // 2, 3])
    alpha_true = 1.0 - np.exp(-field.sigma0 * 2.0 * field.radius)
    assert abs(alpha_b - alpha_true) < 0.08, (alpha_b, alpha_true)


def test_baked_depth_and_majors():
    """Depth at the ball center ≈ distance to the front surface, for a
    camera along each major axis (exercises all permute/flip paths)."""
    field = BallField()
    aabb = coords.BoundingBox.from_aabb_scale(1)
    vol = baked.bake_volume(field, {}, aabb, resolution=64, chunk=1 << 16)
    W = H = 48
    focal = jnp.asarray([W * 1.1, W * 1.1], jnp.float32)
    dist = 1.6
    cams = [
        # -z view (as in _camera), +z view, +x view, -y view
        jnp.asarray([[-1, 0, 0, 0.5], [0, 1, 0, 0.5], [0, 0, -1, 0.5 + dist]], jnp.float32),
        jnp.asarray([[1, 0, 0, 0.5], [0, 1, 0, 0.5], [0, 0, 1, 0.5 - dist]], jnp.float32),
        jnp.asarray([[0, 0, 1, 0.5 - dist], [0, 1, 0, 0.5], [-1, 0, 0, 0.5]], jnp.float32),
        jnp.asarray([[-1, 0, 0, 0.5], [0, 0, 1, 0.5 - dist], [0, -1, 0, 0.5]], jnp.float32),
    ]
    for xf in cams:
        out = baked.render_baked(vol, (W, H), xf, focal, base_resolution=96)
        alpha = float(out.rgba[H // 2, W // 2, 3])
        assert alpha > 0.9, alpha
        depth = float(out.depth[H // 2, W // 2])
        expect = dist - field.radius
        assert abs(depth - (expect + field.radius * 0.35)) < 0.25, (depth, expect)


def test_baked_edit_operators_apply():
    """An AffineDuplication translate with hide-original moves the baked
    content: the bake runs through the operator stack like the renderer."""
    from nerfshop_tpu.editing import operators as op_lib

    field = BallField(center=(0.35, 0.5, 0.5), radius=0.15)
    aabb = coords.BoundingBox.from_aabb_scale(1)
    xform, focal, (W, H) = _camera()

    vol0 = baked.bake_volume(field, {}, aabb, resolution=64, chunk=1 << 16)
    out0 = baked.render_baked(vol0, (W, H), xform, focal, base_resolution=128)

    op = op_lib.AffineDuplicationOp.create(
        center=[0.35, 0.5, 0.5],
        half_extents=[0.18, 0.18, 0.18],
        transform_t=[0.3, 0.0, 0.0],
        hide_original=True,
    )
    vol1 = baked.bake_volume(field, {}, aabb, resolution=64, operators=(op,), chunk=1 << 16)
    out1 = baked.render_baked(vol1, (W, H), xform, focal, base_resolution=128)

    m0 = np.asarray(out0.rgba[..., 3]) > 0.5
    m1 = np.asarray(out1.rgba[..., 3]) > 0.5
    assert m0.sum() > 20 and m1.sum() > 20
    # centroid moved along -x in image space (camera x is flipped)
    cx0 = np.mean(np.nonzero(m0)[1])
    cx1 = np.mean(np.nonzero(m1)[1])
    assert abs(cx1 - cx0) > 4.0, (cx0, cx1)
