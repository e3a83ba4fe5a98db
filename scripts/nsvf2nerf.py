#!/usr/bin/env python3
"""NSVF-format → transforms.json (counterpart of the reference's
scripts/nsvf2nerf.py; fresh implementation from the NSVF dataset layout).

NSVF scenes: intrinsics.txt (4×4 K or "f cx cy" first line), pose/*.txt
(4×4 camera-to-world, OpenCV camera axes: +x right, +y down, +z forward),
rgb/*.png.
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default=".", help="NSVF scene dir (intrinsics.txt, pose/, rgb/)")
    p.add_argument("--out", default="transforms.json")
    p.add_argument("--aabb_scale", type=int, default=1)
    p.add_argument("--width", type=float, default=800)
    p.add_argument("--height", type=float, default=800)
    return p.parse_args()


def read_intrinsics(path):
    vals = np.loadtxt(path)
    if vals.ndim == 2:  # full K matrix
        return float(vals[0, 0]), float(vals[1, 1]), float(vals[0, 2]), float(vals[1, 2])
    v = np.atleast_1d(vals).ravel()
    f, cx, cy = float(v[0]), float(v[1]), float(v[2])
    return f, f, cx, cy


def convert(scene_dir, aabb_scale=1, width=800, height=800):
    scene_dir = Path(scene_dir)
    fl_x, fl_y, cx, cy = read_intrinsics(scene_dir / "intrinsics.txt")
    pose_files = sorted((scene_dir / "pose").glob("*.txt"))
    rgb_files = sorted(
        p for p in (scene_dir / "rgb").iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    frames = []
    for pf in pose_files:
        stem = pf.stem
        img = next((r for r in rgb_files if r.stem == stem), None)
        if img is None:
            continue
        m = np.loadtxt(pf).reshape(4, 4)
        # OpenCV camera → nerf: flip y,z columns
        m[:3, 1] *= -1
        m[:3, 2] *= -1
        frames.append(
            {"file_path": str(img.relative_to(scene_dir)), "transform_matrix": m.tolist()}
        )
    return {
        "camera_angle_x": 2 * math.atan(width / (2 * fl_x)),
        "camera_angle_y": 2 * math.atan(height / (2 * fl_y)),
        "fl_x": fl_x, "fl_y": fl_y, "cx": cx, "cy": cy,
        "w": width, "h": height, "aabb_scale": aabb_scale,
        "scale": 0.5, "offset": [0.5, 0.5, 0.5],
        "frames": frames,
    }


def main():
    args = parse_args()
    out = convert(args.scene, args.aabb_scale, args.width, args.height)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {args.out} with {len(out['frames'])} frames")


if __name__ == "__main__":
    main()
