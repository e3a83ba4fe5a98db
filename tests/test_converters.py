"""Dataset converters (P4): COLMAP/LLFF/NSVF → transforms.json that the
loader accepts, with sane normalization (cameras look at the origin at
average distance 4)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import colmap2nerf
import llff2nerf
import nsvf2nerf


def _rotmat_to_qvec(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def _make_colmap_text(tmp_path, n=6):
    """Cameras on a circle looking at the origin (COLMAP convention:
    +z forward, +y down; world z up)."""
    (tmp_path / "cameras.txt").write_text(
        "# cameras\n1 OPENCV 640 480 500 500 320 240 0.01 -0.005 0 0\n"
    )
    lines = ["# images"]
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = np.array([3 * np.cos(ang), 3 * np.sin(ang), 1.0])
        fwd = -eye / np.linalg.norm(eye)  # toward origin (colmap +z)
        up_w = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up_w)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        Rc2w = np.stack([right, down, fwd], 1)  # columns = camera axes
        Rw2c = Rc2w.T
        t = -Rw2c @ eye
        q = _rotmat_to_qvec(Rw2c)
        lines.append(
            f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 img_{i:02d}.png"
        )
        lines.append("")  # keypoints line
    (tmp_path / "images.txt").write_text("\n".join(lines) + "\n")


def test_colmap2nerf_roundtrip(tmp_path):
    _make_colmap_text(tmp_path)
    out = colmap2nerf.convert(tmp_path, "images", aabb_scale=4)
    assert out["aabb_scale"] == 4
    assert abs(out["fl_x"] - 500) < 1e-6
    assert abs(out["k1"] - 0.01) < 1e-9
    assert len(out["frames"]) == 6
    ms = [np.asarray(f["transform_matrix"]) for f in out["frames"]]
    # normalization: average camera distance ≈ 4
    dists = [np.linalg.norm(m[:3, 3]) for m in ms]
    assert abs(np.mean(dists) - 4.0) < 0.2, dists
    # every camera looks at the origin (forward = −z column toward center)
    for m in ms:
        fwd = -m[:3, 2]
        to_center = -m[:3, 3] / np.linalg.norm(m[:3, 3])
        assert float(fwd @ to_center) > 0.9
    # loader accepts it
    json.dump(out, open(tmp_path / "transforms.json", "w"))
    from nerfshop_tpu.data import nerf_loader

    ds = nerf_loader.load_nerf(tmp_path / "transforms.json", load_images=False)
    assert ds.n_images == 6
    assert abs(ds.intrinsics[0].distortion[0] - 0.01) < 1e-9


def test_llff2nerf(tmp_path):
    n = 4
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        # LLFF columns [down, right, back]: camera at +4x looking −x
        poses[i, :, 0] = [0, 0, -1]  # down (world −z)
        poses[i, :, 1] = [0, 1, 0]  # right
        poses[i, :, 2] = [1, 0, 0]  # back (looking −x)
        poses[i, :, 3] = [4 + 0.1 * i, 0, 0]
        poses[i, :, 4] = [480, 640, 500]
    pb = np.concatenate([poses.reshape(n, 15), np.tile([2.0, 6.0], (n, 1))], 1)
    np.save(tmp_path / "poses_bounds.npy", pb)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    from PIL import Image

    for i in range(n):
        Image.new("RGB", (8, 8)).save(img_dir / f"{i:03d}.png")
    out = llff2nerf.convert(tmp_path)
    assert len(out["frames"]) == n
    m = np.asarray(out["frames"][0]["transform_matrix"])
    # nerf convention: right=+y(world), up=+z(world), back=+x(world)
    np.testing.assert_allclose(m[:3, 0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(m[:3, 1], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(m[:3, 2], [1, 0, 0], atol=1e-6)


def test_nsvf2nerf(tmp_path):
    (tmp_path / "pose").mkdir()
    (tmp_path / "rgb").mkdir()
    (tmp_path / "intrinsics.txt").write_text("555.5 400 400 0\n")
    m = np.eye(4)
    m[:3, 3] = [0, 0, 2]
    np.savetxt(tmp_path / "pose" / "0_00.txt", m)
    from PIL import Image

    Image.new("RGB", (8, 8)).save(tmp_path / "rgb" / "0_00.png")
    out = nsvf2nerf.convert(tmp_path)
    assert len(out["frames"]) == 1
    assert abs(out["fl_x"] - 555.5) < 1e-9
    mm = np.asarray(out["frames"][0]["transform_matrix"])
    # OpenCV→nerf flips y,z columns
    np.testing.assert_allclose(mm[:3, 1], [0, -1, 0], atol=1e-9)
    np.testing.assert_allclose(mm[:3, 2], [0, 0, -1], atol=1e-9)
