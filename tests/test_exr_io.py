import numpy as np
import pytest

from nerfshop_tpu.data import exr, image_io


def test_exr_roundtrip_float(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 4, (33, 47)).astype(np.float32)  # non-multiple of 16 rows
    exr.write_exr(tmp_path / "t.exr", {"R": img, "G": img * 2, "B": img * 3}, pixel_type="float")
    back = exr.read_exr(str(tmp_path / "t.exr"))
    np.testing.assert_allclose(back["R"], img, rtol=1e-6)
    np.testing.assert_allclose(back["B"], img * 3, rtol=1e-6)


def test_exr_roundtrip_half(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    exr.write_exr(tmp_path / "t.exr", {"Y": img}, pixel_type="half")
    back = exr.read_exr(str(tmp_path / "t.exr"))
    np.testing.assert_allclose(back["Y"], img, atol=1e-3)


def test_read_albert():
    path = "/root/reference/data/image/albert.exr"
    import os

    if not os.path.exists(path):
        pytest.skip("no reference data")
    img = exr.read_exr_rgba(path)
    assert img.shape == (1024, 1024, 4)
    assert 0.3 < img.mean() < 0.5  # sanity: mid-gray-ish portrait


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 100).astype(np.float32)
    np.testing.assert_allclose(image_io.srgb_to_linear(image_io.linear_to_srgb(x)), x, atol=1e-5)


def test_ldr_write_read(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    image_io.write_image(tmp_path / "t.png", img)
    back = image_io.read_image(tmp_path / "t.png")
    np.testing.assert_allclose(back, img, atol=2e-2)  # 8-bit quantization
