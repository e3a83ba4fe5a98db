#!/usr/bin/env python3
"""LLFF → transforms.json (counterpart of the reference's scripts/llff2nerf.py;
fresh implementation from the LLFF poses_bounds.npy layout).

poses_bounds.npy: [N, 17] rows = 3×5 pose matrix (rotation | translation |
[H, W, focal] column) + [near, far] bounds. LLFF camera axes are
[down, right, back]; nerf wants [right, up, back].
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default=".", help="LLFF scene dir (poses_bounds.npy + images/)")
    p.add_argument("--images", default="images", help="image subdir")
    p.add_argument("--out", default="transforms.json")
    p.add_argument("--aabb_scale", type=int, default=4)
    p.add_argument("--downscale", type=float, default=1.0, help="focal/resolution divisor")
    return p.parse_args()


def convert(scene_dir, images="images", aabb_scale=4, downscale=1.0):
    scene_dir = Path(scene_dir)
    pb = np.load(scene_dir / "poses_bounds.npy")  # [N, 17]
    poses = pb[:, :15].reshape(-1, 3, 5)
    n = poses.shape[0]
    H, W, focal = poses[0, :, 4]
    H, W, focal = H / downscale, W / downscale, focal / downscale

    img_dir = scene_dir / images
    files = sorted(
        p.name for p in img_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".exr")
    )
    if len(files) != n:
        raise ValueError(f"{len(files)} images vs {n} poses")

    frames = []
    for i in range(n):
        m34 = poses[i, :, :4]
        # LLFF columns [down, right, back] → nerf [right, up, back]
        m34 = np.stack([m34[:, 1], -m34[:, 0], m34[:, 2], m34[:, 3]], 1)
        m = np.eye(4)
        m[:3, :4] = m34
        frames.append({"file_path": f"{images}/{files[i]}", "transform_matrix": m})

    # recenter + rescale like colmap2nerf
    center = np.mean([f["transform_matrix"][:3, 3] for f in frames], axis=0)
    for f in frames:
        f["transform_matrix"][:3, 3] -= center
    avglen = np.mean([np.linalg.norm(f["transform_matrix"][:3, 3]) for f in frames])
    if avglen > 0:
        for f in frames:
            f["transform_matrix"][:3, 3] *= 4.0 / avglen

    return {
        "camera_angle_x": 2 * math.atan(W / (2 * focal)),
        "camera_angle_y": 2 * math.atan(H / (2 * focal)),
        "fl_x": focal, "fl_y": focal, "cx": W / 2, "cy": H / 2,
        "w": W, "h": H, "aabb_scale": aabb_scale,
        "frames": [
            {"file_path": f["file_path"], "transform_matrix": f["transform_matrix"].tolist()}
            for f in frames
        ],
    }


def main():
    args = parse_args()
    out = convert(args.scene, args.images, args.aabb_scale, args.downscale)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {args.out} with {len(out['frames'])} frames")


if __name__ == "__main__":
    main()
