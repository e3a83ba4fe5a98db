"""Render knobs: DoF, render-crop AABB, screen center (pyngp parity:
dof/autofocus, m_render_aabb, m_screen_center)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.models import encodings as enc
from nerfshop_tpu.models import mlp as mlp_lib
from nerfshop_tpu.models import nerf_network as nn
from nerfshop_tpu.ops import grid as grid_lib, rays as rays_lib
from nerfshop_tpu.render import renderer


def _model():
    pos_enc = enc.GridEncoding(
        n_input_dims=3, n_levels=4, n_features_per_level=2,
        log2_hashmap_size=10, base_resolution=4, per_level_scale=1.5,
    )
    m = nn.NerfNetwork(
        pos_encoding=pos_enc,
        dir_encoding=enc.SphericalHarmonicsEncoding(degree=4),
        density_mlp=mlp_lib.MLP(n_input_dims=8, n_output_dims=16, n_neurons=16, n_hidden_layers=1),
        rgb_mlp=mlp_lib.MLP(n_input_dims=32, n_output_dims=3, n_neurons=16, n_hidden_layers=1),
    )
    return m, m.init(jax.random.PRNGKey(0))


def _grid_ball():
    g = (np.arange(128) + 0.5) / 128
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    occ = ((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2) < 0.25**2
    grid = grid_lib.OccupancyGrid.create(1)
    return grid._replace(
        occupancy=jnp.asarray(occ[None]),
        density=jnp.where(jnp.asarray(occ[None]), 5.0, 0.0),
    )


CAM = jnp.asarray([[1.0, 0, 0, 0.5], [0, 1.0, 0, 0.5], [0, 0, 1.0, -0.9]], jnp.float32)
FOCAL = jnp.asarray([40.0, 40.0])


class TestRenderCrop:
    def test_crop_removes_half_the_content(self):
        model, params = _model()
        grid = _grid_ball()
        W = H = 32
        opts = renderer.RenderOptions(aabb_scale=1, chunk=W * H, k_samples=32)
        full = renderer.render_frame(model, params, grid, (W, H), CAM, FOCAL, opts=opts)
        # crop to the left half of the scene (x < 0.5)
        opts_c = dataclasses.replace(opts, render_aabb=((0.0, 0.0, 0.0), (0.5, 1.0, 1.0)))
        crop = renderer.render_frame(model, params, grid, (W, H), CAM, FOCAL, opts=opts_c)
        a_full = np.asarray(full.rgba[..., 3])
        a_crop = np.asarray(crop.rgba[..., 3])
        assert a_full.sum() > 0
        # the cropped-out right half of the image loses its opacity
        assert a_crop[:, W // 2 + 2:].sum() < 0.05 * a_full[:, W // 2 + 2:].sum() + 1e-6
        # the kept half still renders
        assert a_crop[:, : W // 2 - 2].sum() > 0.5 * a_full[:, : W // 2 - 2].sum()


class TestDoF:
    def test_lens_samples_shift_rays(self):
        # rays through the lens disc converge at the focal plane: origins
        # move, directions re-aim, focal-plane intersection is unchanged
        W = H = 4
        xform = jnp.asarray(np.eye(3, 4, dtype=np.float32))
        u = jnp.full((W * H, 2), 0.7)
        b0 = rays_lib.rays_for_image((W, H), xform, FOCAL, jnp.asarray([0.5, 0.5]))
        b1 = rays_lib.rays_for_image((W, H), xform, FOCAL, jnp.asarray([0.5, 0.5]),
                                     aperture=0.05, focus_z=2.0, dof_uv=u)
        assert np.abs(np.asarray(b1.origins - b0.origins)).max() > 1e-3
        # same focal-plane point: o + t*d with t chosen so z-depth = 2.0
        def at_focus(b):
            t = 2.0 / np.asarray(b.directions)[:, 2]
            return np.asarray(b.origins) + t[:, None] * np.asarray(b.directions)
        np.testing.assert_allclose(at_focus(b1), at_focus(b0), atol=1e-4)


class TestScreenCenter:
    def test_principal_shift_moves_content(self):
        model, params = _model()
        grid = _grid_ball()
        W = H = 24
        opts = renderer.RenderOptions(aabb_scale=1, chunk=W * H, k_samples=32)
        a = renderer.render_frame(model, params, grid, (W, H), CAM, FOCAL,
                                  jnp.asarray([0.5, 0.5]), opts=opts)
        b = renderer.render_frame(model, params, grid, (W, H), CAM, FOCAL,
                                  jnp.asarray([0.3, 0.5]), opts=opts)
        ca = np.asarray(a.rgba[..., 3])
        cb = np.asarray(b.rgba[..., 3])
        # content centroid shifts horizontally with the principal point
        xs = np.arange(W)[None, :]
        cen_a = (ca * xs).sum() / max(ca.sum(), 1e-6)
        cen_b = (cb * xs).sum() / max(cb.sum(), 1e-6)
        assert abs(cen_a - cen_b) > 1.0


class TestTestbedLenses:
    def test_latlong_and_ftheta_render(self, tmp_path):
        from test_testbed import _write_tiny_scene, _tiny_nerf_config
        from nerfshop_tpu.testbed import Testbed, TestbedMode

        scene = _write_tiny_scene(tmp_path)
        tb = Testbed(TestbedMode.Nerf, scene=str(scene), config=_tiny_nerf_config())
        tb.train(8, batch_size=4096)
        pin = tb.render(16, 12, spp=1)
        pano = tb.render(16, 12, spp=1, lens="latlong")
        fish = tb.render(16, 12, spp=1, lens="ftheta",
                         ftheta_coeffs=np.asarray([0.0, 0.02, 0, 0, 0], np.float32))
        for img in (pin, pano, fish):
            assert img.shape == (12, 16, 4) and np.isfinite(img).all()
        # the three projections see genuinely different images
        assert np.abs(pin - pano).max() > 1e-3
        assert np.abs(pin - fish).max() > 1e-3

    def test_dof_blurs(self, tmp_path):
        from test_testbed import _write_tiny_scene, _tiny_nerf_config
        from nerfshop_tpu.testbed import Testbed, TestbedMode

        scene = _write_tiny_scene(tmp_path)
        tb = Testbed(TestbedMode.Nerf, scene=str(scene), config=_tiny_nerf_config())
        tb.train(8, batch_size=4096)
        sharp = tb.render(16, 12, spp=2)
        tb.dof = 0.08
        tb.focus_z = 2.5
        blurred = tb.render(16, 12, spp=2)
        assert np.isfinite(blurred).all()
        assert np.abs(blurred - sharp).max() > 1e-4


def test_spp_jitter_low_discrepancy():
    """Halton spp jitter (reference random_val.cuh): valid range, per-pass
    stratification, per-pixel decorrelation."""
    import numpy as np

    from nerfshop_tpu.ops import sampling

    n = 256
    passes = np.stack([sampling.spp_jitter(i, n) for i in range(8)])  # [8, n, 2]
    assert (passes >= 0).all() and (passes < 1).all()
    # per-pixel, the 8 pass offsets are Halton-stratified: mean ~0.5 with a
    # much tighter spread than iid uniform's
    m = passes.mean(axis=0)
    assert np.abs(m - 0.5).mean() < 0.1
    # different pixels get different (scrambled) sequences
    assert np.abs(passes[:, 0] - passes[:, 1]).max() > 0.1
    # deterministic
    np.testing.assert_array_equal(sampling.spp_jitter(3, n), sampling.spp_jitter(3, n))
