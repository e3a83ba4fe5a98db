import json
import os

import numpy as np
import pytest

from nerfshop_tpu.data import nerf_loader


def test_nerf_matrix_to_ngp_roundtrip():
    rng = np.random.default_rng(0)
    m = np.eye(4)[:3]
    m[:, 3] = rng.uniform(-2, 2, 3)
    scale, offset = 0.33, np.array([0.5, 0.5, 0.5], np.float32)
    ngp = nerf_loader.nerf_matrix_to_ngp(m, scale, offset)
    back = nerf_loader.ngp_matrix_to_nerf(ngp, scale, offset)
    np.testing.assert_allclose(back, m, atol=1e-5)


def test_nerf_matrix_translation_scaling():
    m = np.eye(4)[:3].astype(np.float32)
    m[:, 3] = [1.0, 2.0, 3.0]
    ngp = nerf_loader.nerf_matrix_to_ngp(m, 0.5, np.array([0.5, 0.5, 0.5], np.float32))
    # translation scaled+offset THEN rows cycled xyz←yzx
    np.testing.assert_allclose(ngp[:, 3], [2 * 0.5 + 0.5, 3 * 0.5 + 0.5, 1 * 0.5 + 0.5], atol=1e-6)


def test_load_synthetic_dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    frames = []
    (tmp_path / "images").mkdir()
    for i in range(3):
        img = (rng.uniform(0, 1, (8, 10, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"{i}.png")
        frames.append(
            {
                "file_path": f"images/{i}",  # extension-less, like many datasets
                "transform_matrix": np.eye(4).tolist(),
            }
        )
    meta = {"camera_angle_x": 0.7, "aabb_scale": 2, "frames": frames}
    (tmp_path / "transforms.json").write_text(json.dumps(meta))

    ds = nerf_loader.load_nerf(tmp_path / "transforms.json")
    assert ds.n_images == 3
    assert ds.images.shape == (3, 8, 10, 4)
    assert ds.aabb_scale == 2
    assert not ds.is_hdr
    assert ds.intrinsics[0].focal[0] == pytest.approx(0.5 * 10 / np.tan(0.35))
    # alpha filled with 1
    assert np.all(ds.images[..., 3] == 1.0)
    np.testing.assert_allclose(ds.intrinsics[0].principal, [0.5, 0.5])


def test_load_fox_metadata_only():
    path = "/root/reference/data/nerf/fox/transforms.json"
    if not os.path.exists(path):
        pytest.skip("no fox dataset")
    ds = nerf_loader.load_nerf(path, max_images=2)
    assert ds.aabb_scale == 4
    assert ds.n_images == 2
    assert ds.images.shape[-1] == 4
    # fox intrinsics from the json
    assert ds.intrinsics[0].focal[0] == pytest.approx(1375.52 / 1)
    assert ds.intrinsics[0].distortion[0] == pytest.approx(0.0578421)
    # camera positions should be within a few units of the scene center
    assert np.all(np.abs(ds.xforms[:, :, 3] - 0.5) < 4.0)


def test_light_dirs_end_to_end(tmp_path):
    """has_light_dirs scenes (reference nerf_loader.h:38-127): loader parses
    per-frame light_dir, the Testbed builds the network with 3 extra
    dir-encoding dims, a train step runs, and render consumes
    nerf.light_dir."""
    import json

    import numpy as np
    from PIL import Image

    res = 16
    frames = []
    for i in range(2):
        name = f"im{i}.png"
        arr = (np.full((res, res, 3), 40 * (i + 1), np.uint8))
        Image.fromarray(arr).save(tmp_path / name)
        xf = np.eye(4)[:3].tolist()
        frames.append({
            "file_path": name,
            "transform_matrix": xf + [[0, 0, 0, 1]],
            "light_dir": [0.0, 0.3, 0.95],
        })
    tf = {
        "camera_angle_x": 0.9,
        "aabb_scale": 1,
        "frames": frames,
    }
    (tmp_path / "transforms.json").write_text(json.dumps(tf))

    from nerfshop_tpu import Testbed, TestbedMode
    from nerfshop_tpu.data import nerf_loader

    ds = nerf_loader.load_nerf(tmp_path / "transforms.json")
    assert ds.has_light_dirs and ds.light_dirs.shape == (2, 3)

    tb = Testbed(TestbedMode.Nerf)
    tb.load_training_data(str(tmp_path))
    assert tb._model.n_extra_dims == 3
    assert tb._model.dir_encoding.n_input_dims == 6
    loss = tb.train(2, 2048)
    assert np.isfinite(loss)
    img = tb.render(16, 16, spp=1)
    assert np.isfinite(img).all()
