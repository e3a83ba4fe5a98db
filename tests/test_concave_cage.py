"""Concave-cage robustness (VERDICT #9): boundary-conforming
tetrahedralization on an L-shaped cage — no interior coverage holes, and a
translated concave cage moves points continuously (no unwarped seams)."""

import numpy as np
import pytest

from nerfshop_tpu.editing.cage import Cage
from nerfshop_tpu.editing.tet_mesh import TetMesh
from nerfshop_tpu.editing import operators as op_lib
from nerfshop_tpu.geometry.mesh_io import TriMesh


def _l_shape_cage():
    """L-shaped prism: unit-ish L footprint extruded in z (concave edge)."""
    # footprint: (0,0) (2,0) (2,1) (1,1) (1,2) (0,2), scaled to ~[0.3,0.7]
    fp = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], np.float32)
    fp = 0.3 + fp * 0.2
    z0, z1 = 0.35, 0.65
    v = np.concatenate([
        np.concatenate([fp, np.full((6, 1), z0, np.float32)], 1),
        np.concatenate([fp, np.full((6, 1), z1, np.float32)], 1),
    ])
    # triangulate footprint (fan splits that respect the concavity)
    bottom = [[0, 2, 1], [0, 3, 2], [0, 5, 3], [5, 4, 3]]
    top = [[f[0] + 6, f[1] + 6, f[2] + 6] for f in [[0, 1, 2], [0, 2, 3], [0, 3, 5], [5, 3, 4]]]
    sides = []
    for i in range(6):
        j = (i + 1) % 6
        sides += [[i, j, j + 6], [i, j + 6, i + 6]]
    f = np.asarray(bottom + top + sides, np.int32)
    return TriMesh(vertices=v, faces=f)


def _interior_points(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([0.31, 0.31, 0.36], [0.69, 0.69, 0.64], (n, 3)).astype(np.float32)
    # inside the L: x<=0.5 or y<=0.5 (in scaled coords: fp x<=1 → 0.5)
    inside = (pts[:, 0] <= 0.68) & (pts[:, 1] <= 0.68) & (
        (pts[:, 0] <= 0.495) | (pts[:, 1] <= 0.495)
    )
    return pts[inside]


def test_lshape_tet_coverage():
    mesh = _l_shape_cage()
    cage = Cage.from_mesh(mesh)
    tm = TetMesh.from_cage(cage)
    tm.update_deformed(cage)
    op = op_lib.CageDeformationOp.from_tet_mesh(tm)
    pts = _interior_points()
    import jax.numpy as jnp

    found, _, _ = op_lib.tet_lookup(op.lut_def, op.v0_def, op.inv_def, jnp.asarray(pts))
    coverage = float(np.asarray(found).mean())
    assert coverage > 0.985, f"interior coverage {coverage}"  # hairline (<0.006 world) shell at concave creases resolves via near-miss extrapolation in the warp


def test_lshape_translation_moves_points_continuously():
    mesh = _l_shape_cage()
    cage = Cage.from_mesh(mesh)
    tm = TetMesh.from_cage(cage)
    shift = np.array([0.08, 0.0, 0.0], np.float32)
    cage.translate(shift)
    tm.update_deformed(cage)
    op = op_lib.CageDeformationOp.from_tet_mesh(tm)
    import jax.numpy as jnp

    # points inside the DEFORMED cage = interior + shift
    pts = _interior_points(seed=1) + shift
    pos_out, _, empty, in_target = op_lib.cage_map_samples(
        op, jnp.asarray(pts), jnp.asarray(np.tile([[0, 0, 1.0]], (len(pts), 1), ).astype(np.float32))
    )
    in_t = np.asarray(in_target)
    assert in_t.mean() > 0.99, in_t.mean()  # no unwarped holes
    delta = np.asarray(pos_out) - pts
    # rigid translation: every warped point maps back by exactly −shift
    err = np.linalg.norm(delta[in_t] + shift, axis=1)
    assert np.quantile(err, 0.99) < 0.01, np.quantile(err, 0.99)


def test_lut_fanout_growth():
    """A dense tet cluster must not silently truncate LUT candidates."""
    mesh = _l_shape_cage()
    cage = Cage.from_mesh(mesh)
    tm = TetMesh.from_cage(cage, ideal_edge=0.03)  # many small tets
    tm.update_deformed(cage)
    lut_d, _ = tm.build_luts(res=16, max_t=4)  # tiny cap → must grow
    assert lut_d.cells.shape[1] > 4
