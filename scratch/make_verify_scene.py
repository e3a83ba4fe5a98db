"""Tiny synthetic NeRF scene for end-to-end verification: 6 analytic views
of a normal-colored ball, 64x64, k1 distortion. Writes /tmp/verify_scene."""
import json, numpy as np
from PIL import Image
import os

RES, R = 64, 0.22
CENTER = np.array([0.0, 0.0, 0.0])
os.makedirs("/tmp/verify_scene/images", exist_ok=True)
frames = []
for i in range(6):
    ang = i * np.pi / 3
    eye = np.array([2.2*np.cos(ang), 2.2*np.sin(ang), 0.6])
    fwd = (CENTER - eye); fwd /= np.linalg.norm(fwd)
    up = np.array([0., 0., 1.])
    right = np.cross(fwd, up); right /= np.linalg.norm(right)
    upv = np.cross(right, fwd)
    m = np.eye(4)
    m[:3, 0] = right; m[:3, 1] = upv; m[:3, 2] = -fwd; m[:3, 3] = eye
    f = RES * 1.2
    img = np.zeros((RES, RES, 4), np.float32)
    ys, xs = np.mgrid[0:RES, 0:RES]
    dirs_cam = np.stack([(xs+0.5-RES/2)/f, -(ys+0.5-RES/2)/f, -np.ones_like(xs, np.float32)], -1)
    dirs = dirs_cam @ m[:3, :3].T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    oc = eye - CENTER
    b = dirs @ oc; c = oc @ oc - R*R
    disc = b*b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    p = eye + t[..., None]*dirs
    n = (p - CENTER)/R
    col = np.stack([0.5+0.5*n[..., 0], 0.5+0.5*n[..., 1], 0.5+0.5*n[..., 2]], -1)
    img[..., :3] = np.where(hit[..., None], col, 0)
    img[..., 3] = hit.astype(np.float32)
    Image.fromarray((img*255).astype(np.uint8), "RGBA").save(f"/tmp/verify_scene/images/{i:02d}.png")
    frames.append({"file_path": f"images/{i:02d}.png", "transform_matrix": m.tolist()})
meta = {"camera_angle_x": 2*np.arctan(RES/2/f), "fl_x": f, "fl_y": f,
        "cx": RES/2, "cy": RES/2, "w": RES, "h": RES, "aabb_scale": 1,
        "k1": 0.01, "k2": 0.0, "p1": 0.0, "p2": 0.0, "frames": frames}
json.dump(meta, open("/tmp/verify_scene/transforms.json", "w"))
print("scene written to /tmp/verify_scene")
