"""SDF testbed e2e: train a neural SDF of an icosphere, check IoU + render."""

import jax
import numpy as np
import pytest

from test_bvh import icosphere


def _small_sdf_config():
    return {
        "loss": {"otype": "Mape"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "epsilon": 1e-15},
        "encoding": {"otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2,
                     "log2_hashmap_size": 14, "base_resolution": 8, "per_level_scale": 1.6},
        "network": {"n_neurons": 32, "n_hidden_layers": 2},
    }


@pytest.mark.slow
def test_sdf_trains_on_sphere():
    from nerfshop_tpu.train.sdf import SdfTestbed

    mesh = icosphere(subdiv=3)
    tb = SdfTestbed.create(_small_sdf_config(), mesh, jax.random.PRNGKey(0))
    l0 = tb.train(1, batch_size=8192)
    l1 = tb.train(150, batch_size=8192)
    assert l1 < l0
    iou = tb.calculate_iou(n_samples=1 << 14)
    assert iou > 0.9, iou

    # sphere-traced render: silhouette should match the analytic sphere
    cam = np.concatenate([np.eye(3, dtype=np.float32)[:, [0, 1, 2]], np.array([[0.5], [0.5], [-1.0]], np.float32)], 1)
    # look down +z: rows = right/down/forward
    cam = np.array([[1, 0, 0, 0.5], [0, -1, 0, 0.5], [0, 0, 1, -1.0]], np.float32)
    img = tb.render(32, 32, cam, np.array([40.0, 40.0], np.float32))
    assert img.shape == (32, 32, 4)
    # center pixel hits, corner doesn't (mesh is normalized to fill ~0.9 cube)
    assert img[16, 16, 3] > 0.5
    assert img[0, 0, 3] < 0.5


def test_sdf_testbed_facade(tmp_path):
    from nerfshop_tpu.geometry import mesh_io
    from nerfshop_tpu import Testbed, TestbedMode

    mesh = icosphere(subdiv=2)
    mesh_io.save_obj(tmp_path / "sphere.obj", mesh)

    tb = Testbed(TestbedMode.Sdf, config=_small_sdf_config())
    tb.load_training_data(str(tmp_path / "sphere.obj"))
    loss = tb.train(n_steps=3, batch_size=4096)
    assert np.isfinite(loss)
    iou = tb.calculate_iou(n_samples=4096)
    assert 0.0 <= iou <= 1.0
