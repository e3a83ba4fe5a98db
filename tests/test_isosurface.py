"""Marching-tetrahedra isosurface vs analytic sphere."""

import numpy as np
import pytest

from nerfshop_tpu.geometry import isosurface


def _sphere_field(res=48, radius=0.3):
    g = (np.arange(res) + 0.5) / res
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    return radius - r  # >0 inside


def test_sphere_surface_accuracy():
    res = 48
    field = _sphere_field(res)
    mesh = isosurface.marching_tets(field, iso=0.0, origin=(0.5 / res,) * 3, spacing=(1.0 / res,) * 3)
    assert mesh.n_faces > 500
    r = np.linalg.norm(mesh.vertices - 0.5, axis=-1)
    # all vertices within half a cell of the true sphere
    assert np.abs(r - 0.3).max() < 1.0 / res

    # watertight check: every edge shared by exactly 2 faces
    edges = np.sort(
        np.concatenate([mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]], mesh.faces[:, [2, 0]]]),
        axis=1,
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()

    # surface area within 10% of 4πr²
    v = mesh.vertices[mesh.faces]
    area = 0.5 * np.linalg.norm(np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1).sum()
    assert abs(area - 4 * np.pi * 0.09) / (4 * np.pi * 0.09) < 0.1


def test_orientation():
    res = 32
    field = _sphere_field(res)
    mesh = isosurface.marching_tets(field, iso=0.0, origin=(0.5 / res,) * 3, spacing=(1.0 / res,) * 3)

    def field_fn(p):
        return 0.3 - np.linalg.norm(p - 0.5, axis=-1)

    mesh = isosurface.orient_faces_outward(mesh, field_fn)
    fn = mesh.face_normals()
    cent = mesh.vertices[mesh.faces].mean(1)
    outward = np.einsum("ij,ij->i", fn, cent - 0.5)
    assert (outward > 0).mean() > 0.99


def test_empty_field():
    mesh = isosurface.marching_tets(np.zeros((8, 8, 8)) - 1.0)
    assert mesh.n_faces == 0
