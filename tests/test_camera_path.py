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
