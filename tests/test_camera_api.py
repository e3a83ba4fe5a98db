"""Testbed camera-control API (pyngp parity: fov / view_dir / look_at /
translate_camera / set_camera_to_training_view / get_camera_extrinsics,
src/python_api.cu camera accessors)."""

import json

import numpy as np
import pytest

from nerfshop_tpu.testbed import Testbed, TestbedMode


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("cam_scene")
    (d / "images").mkdir()
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = []
    for i in range(3):
        img = (rng.uniform(0, 255, (8, 8, 3))).astype(np.uint8)
        Image.fromarray(img).save(d / "images" / f"{i}.png")
        ang = i * 0.4
        c, s = np.cos(ang), np.sin(ang)
        mat = [
            [c, 0, s, float(2 * s)],
            [0, 1, 0, 0.0],
            [-s, 0, c, float(2 * c)],
            [0, 0, 0, 1.0],
        ]
        frames.append({"file_path": f"images/{i}.png", "transform_matrix": mat})
    meta = {
        "camera_angle_x": 0.9,
        "frames": frames,
        "scale": 0.5,
        "offset": [0.5, 0.5, 0.5],
    }
    (d / "transforms.json").write_text(json.dumps(meta))
    return d


class TestCameraApi:
    def test_fov_property_roundtrip(self):
        tb = Testbed(TestbedMode.Nerf)
        tb.fov = 72.0
        assert tb.fov == 72.0 and tb.fov_deg == 72.0
        f = tb._focal_for(100, 100)
        np.testing.assert_allclose(f[1], 50.0 / np.tan(np.radians(36.0)), rtol=1e-5)

    def test_view_dir_and_look_at(self):
        tb = Testbed(TestbedMode.Nerf)
        tb.view_distance = 2.0
        tb.look_at = (0.5, 0.5, 0.5)
        np.testing.assert_allclose(tb.look_at, [0.5, 0.5, 0.5], atol=1e-6)
        tb.view_dir = (1.0, 0.0, 0.0)
        np.testing.assert_allclose(tb.view_dir, [1, 0, 0], atol=1e-6)
        # look-at point preserved under view rotation
        np.testing.assert_allclose(tb.look_at, [0.5, 0.5, 0.5], atol=1e-5)
        # camera sits view_distance behind the orbit point
        np.testing.assert_allclose(tb.camera_matrix[:, 3], [-1.5, 0.5, 0.5], atol=1e-5)

    def test_translate_camera_local_frame(self):
        tb = Testbed(TestbedMode.Nerf)
        before = tb.camera_matrix[:, 3].copy()
        tb.translate_camera((0.0, 0.0, 0.25))  # forward
        after = tb.camera_matrix[:, 3]
        np.testing.assert_allclose(after - before, tb.view_dir * 0.25, atol=1e-6)

    def test_training_view_roundtrip(self, tiny_scene):
        tb = Testbed(TestbedMode.Nerf, scene=str(tiny_scene))
        tb.set_camera_to_training_view(1)
        np.testing.assert_allclose(tb.camera_matrix, tb._dataset.xforms[1], atol=1e-6)
        # fov derived from the view's focal length
        intr = tb._dataset.intrinsics[1]
        expect = np.degrees(2 * np.arctan(0.5 * intr.resolution[1] / intr.focal[1]))
        assert abs(tb.fov - expect) < 1e-4

    def test_extrinsics_nerf_roundtrip(self, tiny_scene):
        tb = Testbed(TestbedMode.Nerf, scene=str(tiny_scene))
        nerf_mat = tb.get_camera_extrinsics(2, convention="nerf")
        tb.set_camera_extrinsics(2, nerf_mat, convention="nerf")
        back = tb.get_camera_extrinsics(2, convention="nerf")
        np.testing.assert_allclose(back, nerf_mat, atol=1e-5)
        # ngp convention returns the raw stored pose
        np.testing.assert_allclose(
            tb.get_camera_extrinsics(2, convention="ngp"), tb._dataset.xforms[2], atol=1e-6
        )

    def test_training_step_alias(self):
        tb = Testbed(TestbedMode.Nerf)
        assert tb.training_step == tb.stats.step == 0
