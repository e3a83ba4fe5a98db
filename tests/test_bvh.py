"""BVH signed-distance & ray-intersection against analytic oracles
(cube + icosphere meshes where distances are known)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.geometry import bvh as bvh_lib
from nerfshop_tpu.geometry.mesh_io import TriMesh


def cube_mesh(lo=0.25, hi=0.75):
    v = np.array(
        [[lo, lo, lo], [hi, lo, lo], [lo, hi, lo], [hi, hi, lo],
         [lo, lo, hi], [hi, lo, hi], [lo, hi, hi], [hi, hi, hi]], np.float32
    )
    # outward-oriented faces
    f = np.array(
        [[0, 2, 1], [1, 2, 3],  # z=lo
         [4, 5, 6], [5, 7, 6],  # z=hi
         [0, 1, 4], [1, 5, 4],  # y=lo
         [2, 6, 3], [3, 6, 7],  # y=hi
         [0, 4, 2], [2, 4, 6],  # x=lo
         [1, 3, 5], [3, 7, 5]], np.int32  # x=hi
    )
    return TriMesh(v, f)


def icosphere(center=(0.5, 0.5, 0.5), radius=0.3, subdiv=3):
    t = (1 + 5**0.5) / 2
    v = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64
    )
    f = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64
    )
    for _ in range(subdiv):
        mid = {}
        nf = []
        v = list(map(np.asarray, v))

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                mid[key] = len(v)
                v.append((v[a] + v[b]) / 2)
            return mid[key]

        for tri in f:
            a, b, c = tri
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        f = np.asarray(nf)
        v = np.stack(v)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True) * radius + np.asarray(center)
    return TriMesh(v.astype(np.float32), f.astype(np.int32))


def test_signed_distance_cube():
    m = cube_mesh()
    bvh = bvh_lib.build_bvh(m.vertices, m.faces)
    pts = jnp.asarray([
        [0.5, 0.5, 0.5],   # center: inside, dist −0.25
        [0.5, 0.5, 0.9],   # outside above: +0.15
        [0.1, 0.5, 0.5],   # outside left: +0.15
        [0.5, 0.5, 0.70],  # inside near top: −0.05
    ])
    d = np.asarray(bvh_lib.signed_distance(bvh, pts))
    np.testing.assert_allclose(d, [-0.25, 0.15, 0.15, -0.05], atol=1e-5)


def test_signed_distance_sphere_random():
    m = icosphere(subdiv=3)
    bvh = bvh_lib.build_bvh(m.vertices, m.faces)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.1, 0.9, (256, 3)).astype(np.float32)
    d = np.asarray(bvh_lib.signed_distance(bvh, jnp.asarray(pts)))
    expect = np.linalg.norm(pts - 0.5, axis=-1) - 0.3
    # icosphere approximates the sphere; tolerance covers faceting
    np.testing.assert_allclose(d, expect, atol=5e-3)
    # signs must be exact away from the surface
    far = np.abs(expect) > 2e-2
    assert (np.sign(d[far]) == np.sign(expect[far])).all()


def test_ray_intersect_cube():
    m = cube_mesh()
    bvh = bvh_lib.build_bvh(m.vertices, m.faces)
    o = jnp.asarray([[0.5, 0.5, -1.0], [2.0, 2.0, 2.0], [0.5, 0.5, 0.5]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    t, tri = bvh_lib.ray_intersect(bvh, o, d)
    t = np.asarray(t)
    assert t[0] == pytest.approx(1.25, abs=1e-5)  # hits z=0.25 face
    assert t[1] == bvh_lib._FAR  # miss
    assert int(tri[1]) == -1
    assert t[2] == pytest.approx(0.25, abs=1e-5)  # inside → hits x=0.75


def test_bvh_matches_bruteforce():
    m = icosphere(subdiv=1)
    bvh = bvh_lib.build_bvh(m.vertices, m.faces)
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    d_bvh = np.abs(np.asarray(bvh_lib.signed_distance(bvh, jnp.asarray(pts))))

    tris = m.vertices[m.faces]
    pt, _ = bvh_lib._closest_point_tri(
        jnp.asarray(pts)[:, None, :],
        jnp.asarray(tris[None, :, 0]),
        jnp.asarray(tris[None, :, 1] - tris[None, :, 0]),
        jnp.asarray(tris[None, :, 2] - tris[None, :, 0]),
    )
    d_bf = np.sqrt(np.asarray(jnp.min(jnp.sum((pt - jnp.asarray(pts)[:, None]) ** 2, -1), axis=1)))
    np.testing.assert_allclose(d_bvh, d_bf, atol=1e-5)
