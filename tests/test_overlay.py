"""Viewer debug-draw overlays (E17: camera frusta / unit cube / cage
wireframe, reference growing_selection.cu draw_selection_gl + cage.cu)."""

import numpy as np

from nerfshop_tpu.viewer import overlay


def _look_at(eye, center=(0.5, 0.5, 0.5), up=(0, 0, 1)):
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(center, np.float32) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float32))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    return np.concatenate([np.stack([right, down, fwd], 1), eye[:, None]], 1).astype(np.float32)


CAM = _look_at((0.5, -1.5, 0.5))
FOCAL = np.asarray([80.0, 80.0], np.float32)


class TestProjection:
    def test_center_point_projects_to_image_center(self):
        p, ok = overlay._project(np.asarray([[0.5, 0.5, 0.5]], np.float32), CAM, FOCAL, (64, 64))
        assert ok[0]
        np.testing.assert_allclose(p[0], [32.0, 32.0], atol=1e-4)

    def test_behind_camera_masked(self):
        _, ok = overlay._project(np.asarray([[0.5, -3.0, 0.5]], np.float32), CAM, FOCAL, (64, 64))
        assert not ok[0]


class TestDraws:
    def test_unit_cube_draws_pixels(self):
        img = np.zeros((64, 64, 4), np.float32)
        overlay.draw_segments(img, overlay.unit_cube_segments(), CAM, FOCAL, (0, 0, 1, 1))
        assert (img[..., 2] > 0).sum() > 40  # wireframe visible

    def test_points_draw(self):
        img = np.zeros((64, 64, 4), np.float32)
        overlay.draw_points(img, np.asarray([[0.5, 0.5, 0.5]]), CAM, FOCAL)
        assert img[32, 32, 1] == 1.0

    def test_camera_frustum_segments_shape(self):
        segs = overlay.camera_frustum_segments(CAM)
        assert segs.shape == (8, 2, 3)

    def test_mesh_segments_unique_edges(self):
        from nerfshop_tpu.editing.selection import make_box_mesh

        box = make_box_mesh(np.zeros(3), np.ones(3))
        segs = overlay.mesh_segments(box.vertices, box.faces)
        assert len(segs) == 18  # 12 cube edges + 6 face diagonals

    def test_apply_overlays_flags(self):
        class FakeDs:
            xforms = np.stack([CAM, CAM])

        class FakeTb:
            _dataset = FakeDs()
            _gs = None

        img = np.zeros((48, 48, 4), np.float32)
        out = overlay.apply_overlays(
            img, FakeTb(), CAM, FOCAL,
            visualize_cameras=True, visualize_unit_cube=True,
        )
        assert (out[..., 3] > 0).any()
        # no-flag call leaves the image untouched
        img2 = np.zeros((48, 48, 4), np.float32)
        out2 = overlay.apply_overlays(img2, FakeTb(), CAM, FOCAL)
        assert (out2 == 0).all()
