#!/usr/bin/env python3
"""COLMAP → transforms.json converter (counterpart of the reference's
scripts/colmap2nerf.py, 306 LoC — implemented from the COLMAP text-model
format spec; behavior parity: camera-model parsing, w2c→c2w,
nerf-axis flips, up-vector reorientation, center-of-attention recentering,
average-distance rescale to 4.0, sharpness scores).

Usage:
    python scripts/colmap2nerf.py --text colmap_text/ --images images/ \
        --out transforms.json --aabb_scale 8

Expects COLMAP's text export (cameras.txt + images.txt), e.g. from
``colmap model_converter --output_type TXT``.
"""

from __future__ import annotations

import argparse
import json
import math
import os
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--text", default="colmap_text", help="dir with cameras.txt/images.txt")
    p.add_argument("--images", default="images", help="image dir (relative paths in output)")
    p.add_argument("--out", default="transforms.json")
    p.add_argument("--aabb_scale", type=int, default=8, choices=[1, 2, 4, 8, 16, 32, 64, 128])
    p.add_argument("--skip_early", type=int, default=0, help="ignore the first N images")
    p.add_argument("--keep_colmap_coords", action="store_true",
                   help="skip the reorient/recenter/rescale normalization")
    return p.parse_args()


def qvec_to_rotmat(q):
    """COLMAP quaternion (w, x, y, z) → rotation matrix."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def read_cameras_text(path):
    """cameras.txt → {camera_id: intrinsics dict}."""
    cams = {}
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        cam_id, model = int(parts[0]), parts[1]
        w, h = float(parts[2]), float(parts[3])
        prm = [float(v) for v in parts[4:]]
        out = {"w": w, "h": h, "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0}
        if model == "SIMPLE_PINHOLE":
            out.update(fl_x=prm[0], fl_y=prm[0], cx=prm[1], cy=prm[2])
        elif model == "PINHOLE":
            out.update(fl_x=prm[0], fl_y=prm[1], cx=prm[2], cy=prm[3])
        elif model == "SIMPLE_RADIAL":
            out.update(fl_x=prm[0], fl_y=prm[0], cx=prm[1], cy=prm[2], k1=prm[3])
        elif model == "RADIAL":
            out.update(fl_x=prm[0], fl_y=prm[0], cx=prm[1], cy=prm[2], k1=prm[3], k2=prm[4])
        elif model == "OPENCV":
            out.update(fl_x=prm[0], fl_y=prm[1], cx=prm[2], cy=prm[3],
                       k1=prm[4], k2=prm[5], p1=prm[6], p2=prm[7])
        else:
            raise ValueError(f"unsupported COLMAP camera model {model!r}")
        out["camera_angle_x"] = 2 * math.atan(w / (2 * out["fl_x"]))
        out["camera_angle_y"] = 2 * math.atan(h / (2 * out["fl_y"]))
        cams[cam_id] = out
    return cams


def read_images_text(path):
    """images.txt → [(name, camera_id, c2w 4x4 in COLMAP world)] (pose lines
    alternate with keypoint lines)."""
    out = []
    expect_pose = True
    for raw in open(path):
        line = raw.strip()
        if line.startswith("#"):
            continue
        if expect_pose:
            if not line:
                continue
            e = line.split()
            q = np.array([float(v) for v in e[1:5]])
            t = np.array([float(v) for v in e[5:8]])
            cam_id = int(e[8])
            name = "_".join(e[9:])
            R = qvec_to_rotmat(q)  # world-to-camera
            c2w = np.eye(4)
            c2w[:3, :3] = R.T
            c2w[:3, 3] = -R.T @ t
            out.append((name, cam_id, c2w))
            expect_pose = False
        else:
            # the (possibly empty) 2D-keypoints line
            expect_pose = True
    return out


def sharpness(image_path) -> float:
    """Variance of the Laplacian — the reference's per-frame sharpness score."""
    try:
        from PIL import Image

        img = np.asarray(Image.open(image_path).convert("L"), np.float32)
        lap = (
            -4 * img[1:-1, 1:-1]
            + img[:-2, 1:-1]
            + img[2:, 1:-1]
            + img[1:-1, :-2]
            + img[1:-1, 2:]
        )
        return float(lap.var())
    except Exception:
        return 0.0


def line_pair_focus(o1, d1, o2, d2):
    """Midpoint of the closest approach between two camera view lines, plus
    a confidence weight (sin² of the angle between them — parallel pairs
    contribute nothing).

    Derivation (least squares, not the cross-product/Cramer form): minimize
    |o1 + s·d1 − (o2 + t·d2)|² over (s, t). With unit directions the normal
    equations are [[1, −g], [−g, 1]] @ [s, t] = [d1·r, −d2·r] where
    g = d1·d2 and r = o2 − o1; the determinant 1 − g² is |d1×d2|², which
    doubles as the weight. Parameters are clamped to ≤ 0 so a camera pair
    whose solution lands behind either eye degrades to the eye itself
    (matches the reference converter's behavior)."""
    d1 = d1 / np.linalg.norm(d1)
    d2 = d2 / np.linalg.norm(d2)
    g = float(np.dot(d1, d2))
    r = o2 - o1
    det = 1.0 - g * g  # == |d1 × d2|²
    s = min(0.0, (np.dot(d1, r) - g * np.dot(d2, r)) / (det + 1e-10))
    t = min(0.0, (g * np.dot(d1, r) - np.dot(d2, r)) / (det + 1e-10))
    return 0.5 * ((o1 + s * d1) + (o2 + t * d2)), det


def rotmat_between(a, b):
    """Rotation taking unit vector a to unit vector b."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-8:  # opposite: rotate 180° about any orthogonal axis
        axis = np.cross(a, [1.0, 0.0, 0.0])
        if np.linalg.norm(axis) < 1e-6:
            axis = np.cross(a, [0.0, 1.0, 0.0])
        axis /= np.linalg.norm(axis)
        return -np.eye(3) + 2 * np.outer(axis, axis)
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + vx + vx @ vx * (1.0 / (1.0 + c))


def normalize_scene(frames):
    """Reorient so the average camera 'up' is +z, recenter on the cameras'
    point of attention, rescale so the average camera distance is 4
    (instant-ngp's normalization so scenes land inside the unit aabb after
    the loader's scale=0.33/offset=0.5)."""
    up = np.zeros(3)
    for f in frames:
        m = f["transform_matrix"]
        # nerf convention: camera up = +y column
        up += m[:3, 1]
    R = np.eye(4)
    R[:3, :3] = rotmat_between(up, np.array([0.0, 0.0, 1.0]))
    for f in frames:
        f["transform_matrix"] = R @ f["transform_matrix"]

    # center of attention: confidence-weighted mean of all pairwise
    # view-line focus points (nerf convention: forward = −z column)
    eyes = np.stack([f["transform_matrix"][:3, 3] for f in frames])
    fwds = np.stack([-f["transform_matrix"][:3, 2] for f in frames])
    focus_sum, weight_sum = np.zeros(3), 0.0
    for i in range(len(frames)):
        for j in range(len(frames)):
            pt, w = line_pair_focus(eyes[i], fwds[i], eyes[j], fwds[j])
            if w > 1e-5:
                focus_sum += w * pt
                weight_sum += w
    center = focus_sum / weight_sum if weight_sum > 0 else np.zeros(3)
    for f in frames:
        f["transform_matrix"][:3, 3] -= center

    avglen = np.mean([np.linalg.norm(f["transform_matrix"][:3, 3]) for f in frames])
    scale = 4.0 / max(avglen, 1e-9)
    for f in frames:
        f["transform_matrix"][:3, 3] *= scale
    return frames


def convert(text_dir, image_dir, aabb_scale=8, skip_early=0, keep_colmap_coords=False):
    cams = read_cameras_text(Path(text_dir) / "cameras.txt")
    images = read_images_text(Path(text_dir) / "images.txt")
    images.sort(key=lambda e: e[0])

    frames = []
    for name, cam_id, c2w in images[skip_early:]:
        m = c2w.copy()
        if not keep_colmap_coords:
            # COLMAP camera: +x right, +y down, +z forward.
            # nerf convention: +x right, +y up, −z forward → flip y,z columns.
            m[:3, 1] *= -1
            m[:3, 2] *= -1
            # world axes: COLMAP y-down world → nerf-ish (the reference also
            # permutes world rows so gravity ends up along −z pre-reorient)
            m = m[[1, 0, 2, 3], :]
            m[2, :] *= -1
        frames.append(
            {
                "file_path": str(Path(image_dir) / name),
                "sharpness": sharpness(Path(image_dir) / name),
                "transform_matrix": m,
                "camera_id": cam_id,
            }
        )
    if not keep_colmap_coords and len(frames) > 1:
        frames = normalize_scene(frames)

    cam0 = cams[frames[0]["camera_id"]] if frames else next(iter(cams.values()))
    out = dict(cam0)
    out["aabb_scale"] = aabb_scale
    out["frames"] = [
        {
            "file_path": f["file_path"],
            "sharpness": f["sharpness"],
            "transform_matrix": np.asarray(f["transform_matrix"]).tolist(),
        }
        for f in frames
    ]
    # per-frame intrinsics when multiple cameras are present
    if len(cams) > 1:
        for f, meta in zip(out["frames"], frames):
            f.update({k: v for k, v in cams[meta["camera_id"]].items()})
    return out


def main():
    args = parse_args()
    out = convert(args.text, args.images, args.aabb_scale, args.skip_early,
                  args.keep_colmap_coords)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {args.out} with {len(out['frames'])} frames")


if __name__ == "__main__":
    main()
