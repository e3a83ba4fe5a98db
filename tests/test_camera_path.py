import numpy as np
import pytest

from nerfshop_tpu.render import camera_path as cp


def test_quat_mat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        ang = rng.uniform(0, np.pi)
        from nerfshop_tpu.ops import rays as rays_lib
        import jax.numpy as jnp

        R = np.asarray(rays_lib.rodrigues(jnp.asarray(v * ang)))
        q = cp.mat_to_quat(R)
        np.testing.assert_allclose(cp.quat_to_mat(q), R, atol=1e-5)


def test_path_interpolates_through_keyframes():
    path = cp.CameraPath()
    m0 = np.eye(4)[:3].astype(np.float32)
    m1 = np.eye(4)[:3].astype(np.float32)
    m1[:, 3] = [1, 2, 3]
    path.add_camera(m0, fov_deg=40)
    path.add_camera(m1, fov_deg=60)
    k_start = path.eval(0.0)
    k_end = path.eval(1.0)
    np.testing.assert_allclose(k_start.position, [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(k_end.position, [1, 2, 3], atol=1e-6)
    k_mid = path.eval(0.5)
    np.testing.assert_allclose(k_mid.position, [0.5, 1.0, 1.5], atol=1e-6)
    assert k_mid.fov_deg == pytest.approx(50.0)


def test_path_save_load(tmp_path):
    path = cp.CameraPath()
    m = np.eye(4)[:3]
    m[:, 3] = [0.1, 0.2, 0.3]
    path.add_camera(m, fov_deg=45, aperture=0.01)
    path.save(tmp_path / "p.json")
    back = cp.CameraPath.load(tmp_path / "p.json")
    assert len(back.keyframes) == 1
    np.testing.assert_allclose(back.keyframes[0].position, [0.1, 0.2, 0.3])
    assert back.keyframes[0].fov_deg == 45


def test_render_modes_slice_distance_stepsize():
    """V4 parity: Slice/Distance/Stepsize render modes produce sane output."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfshop_tpu.common import RenderMode
    from nerfshop_tpu.models import encodings as enc
    from nerfshop_tpu.models import mlp as mlp_lib
    from nerfshop_tpu.models import nerf_network as nn
    from nerfshop_tpu.ops import grid as grid_lib
    from nerfshop_tpu.render import renderer

    model = nn.NerfNetwork(
        pos_encoding=enc.GridEncoding(n_levels=2, n_features_per_level=2,
                                      log2_hashmap_size=10, base_resolution=8),
        dir_encoding=enc.SphericalHarmonicsEncoding(degree=2),
        density_mlp=mlp_lib.MLP(n_input_dims=4, n_output_dims=16, n_neurons=16, n_hidden_layers=1),
        rgb_mlp=mlp_lib.MLP(n_input_dims=20, n_output_dims=3, n_neurons=16, n_hidden_layers=1),
    )
    params = model.init(jax.random.PRNGKey(0))
    grid = grid_lib.OccupancyGrid.create(1)
    xf = jnp.asarray([[1.0, 0, 0, 0.5], [0, 1.0, 0, 0.5], [0, 0, 1.0, -0.6]], jnp.float32)
    for mode in (RenderMode.Slice, RenderMode.Distance, RenderMode.Stepsize):
        opts = renderer.RenderOptions(k_samples=8, n_candidates=64, n_windows=1,
                                      chunk=64, mode=mode, slice_z=0.9)
        out = renderer.render_frame(model, params, grid, (8, 8), xf,
                                    jnp.asarray([8.0, 8.0]), opts=opts)
        assert np.isfinite(np.asarray(out.rgba)).all(), mode


def test_gt_overlay_modes():
    import jax.numpy as jnp
    import numpy as np

    from nerfshop_tpu.render.buffer import overlay_ground_truth

    pred = jnp.ones((8, 8, 4)) * 0.8
    gt = jnp.zeros((8, 8, 3))
    split = np.asarray(overlay_ground_truth(pred, gt, "split"))
    assert split[:, :4, 0].max() == 0.0 and split[:, 4:, 0].min() > 0.7
    err = np.asarray(overlay_ground_truth(pred, gt, "error"))
    assert err[..., 0].min() > 0.9  # large error → red channel saturated
    blend = np.asarray(overlay_ground_truth(pred, gt, "blend"))
    assert abs(float(blend[..., 0].mean()) - 0.4) < 1e-5
