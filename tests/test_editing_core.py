"""Editing-core invariants (SURVEY §4f): MVC partition of unity & linear
precision, tet-mesh construction, identity-cage no-op warp, translation
warp, copy-mode source preservation, affine duplication."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerfshop_tpu.editing import mvc as mvc_lib
from nerfshop_tpu.editing import operators as ops
from nerfshop_tpu.editing.cage import Cage
from nerfshop_tpu.editing.tet_mesh import TetMesh
from test_bvh import cube_mesh, icosphere


@pytest.fixture(scope="module")
def cube_cage():
    return Cage.from_mesh(cube_mesh(0.3, 0.7))


@pytest.fixture(scope="module")
def cube_tets(cube_cage):
    return TetMesh.from_cage(cube_cage, ideal_edge=0.1)


def test_mvc_partition_of_unity_and_linear_precision(cube_cage):
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.35, 0.65, (128, 3)).astype(np.float32)
    w = mvc_lib.mvc_weights(
        jnp.asarray(pts), jnp.asarray(cube_cage.vertices_original), jnp.asarray(cube_cage.faces)
    )
    w = np.asarray(w)
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)
    recon = w @ cube_cage.vertices_original
    np.testing.assert_allclose(recon, pts, atol=1e-4)


def test_mvc_cube_center_symmetry(cube_cage):
    """MVC of a *triangulated* cube is triangulation-dependent, so the center
    doesn't get uniform 1/8 weights; but the triangulation's symmetry group
    (swap around the 0-7 diagonal of our cube_mesh split) must hold, and all
    weights must be positive at the center."""
    w = np.asarray(
        mvc_lib.mvc_weights(
            jnp.asarray([[0.5, 0.5, 0.5]]),
            jnp.asarray(cube_cage.vertices_original),
            jnp.asarray(cube_cage.faces),
        )
    )[0]
    assert (w > 0).all()
    assert w.sum() == pytest.approx(1.0, abs=1e-5)
    # vertices 0 and 7 are the diagonal; the other six are equivalent
    assert w[0] == pytest.approx(w[7], abs=1e-5)
    np.testing.assert_allclose(w[1:7], w[1], atol=1e-5)


def test_mvc_on_vertex(cube_cage):
    w = np.asarray(
        mvc_lib.mvc_weights(
            jnp.asarray(cube_cage.vertices_original[:1]),
            jnp.asarray(cube_cage.vertices_original),
            jnp.asarray(cube_cage.faces),
        )
    )
    assert w[0, 0] == pytest.approx(1.0, abs=1e-4)


def test_mvc_sphere_cage_linear_precision():
    sph = icosphere(subdiv=2, radius=0.35)
    cage = Cage.from_mesh(sph)
    rng = np.random.default_rng(1)
    pts = (rng.normal(size=(64, 3)) * 0.1 + 0.5).astype(np.float32)
    pts = pts[np.linalg.norm(pts - 0.5, axis=1) < 0.25]
    w = np.asarray(
        mvc_lib.mvc_weights(jnp.asarray(pts), jnp.asarray(cage.vertices_original), jnp.asarray(cage.faces))
    )
    recon = w @ cage.vertices_original
    np.testing.assert_allclose(recon, pts, atol=1e-3)


def test_tet_mesh_fills_cage(cube_tets, cube_cage):
    tm = cube_tets
    assert tm.n_tets > 10
    v = tm.vertices_original[tm.tets]
    vol = np.abs(
        np.einsum("ij,ij->i", np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), v[:, 3] - v[:, 0]) / 6
    ).sum()
    assert vol == pytest.approx(0.4**3, rel=0.05)  # cage volume


def test_tet_mesh_identity_deformation(cube_tets, cube_cage):
    tm = cube_tets
    tm.update_deformed(cube_cage)  # cage not moved
    np.testing.assert_allclose(tm.vertices_deformed, tm.vertices_original, atol=1e-3)
    rot = tm.rotations
    np.testing.assert_allclose(rot, np.tile(np.eye(3), (tm.n_tets, 1, 1)), atol=1e-2)


def test_identity_cage_warp_is_noop(cube_tets, cube_cage):
    tm = cube_tets
    tm.update_deformed(cube_cage)
    op = ops.CageDeformationOp.from_tet_mesh(tm)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(0.2, 0.8, (256, 3)).astype(np.float32))
    dirs = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (256, 1)).astype(np.float32))
    pos_out, dir_out, empty, in_target = ops.cage_map_samples(op, pts, dirs)
    np.testing.assert_allclose(np.asarray(pos_out), np.asarray(pts), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dir_out), np.asarray(dirs), atol=1e-2)
    assert not bool(empty.any())  # identity: target covers source


def test_translated_cage_backward_warp(cube_cage):
    cage = Cage.from_mesh(cube_mesh(0.3, 0.7))
    tm = TetMesh.from_cage(cage, ideal_edge=0.1)
    cage.translate([0.2, 0.0, 0.0])
    tm.update_deformed(cage)
    op = ops.CageDeformationOp.from_tet_mesh(tm)

    # a point in the TARGET (translated) region maps back by −0.2 in x
    p = jnp.asarray([[0.7, 0.5, 0.5]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    pos_out, dir_out, empty, in_target = ops.cage_map_samples(op, p, d)
    assert bool(in_target[0])
    np.testing.assert_allclose(np.asarray(pos_out[0]), [0.5, 0.5, 0.5], atol=5e-3)
    assert not bool(empty[0])

    # a point left behind in the source-only region is emptied
    p_src = jnp.asarray([[0.35, 0.5, 0.5]])
    pos_out, _, empty, in_target = ops.cage_map_samples(op, p_src, d)
    assert not bool(in_target[0])
    assert bool(empty[0])

    # copy mode keeps the source visible
    op_copy = op._replace(copy_mode=jnp.asarray(True))
    _, _, empty_c, _ = ops.cage_map_samples(op_copy, p_src, d)
    assert not bool(empty_c[0])


def test_map_positions_kill(cube_cage):
    cage = Cage.from_mesh(cube_mesh(0.3, 0.7))
    tm = TetMesh.from_cage(cage, ideal_edge=0.1)
    cage.translate([0.25, 0.0, 0.0])
    tm.update_deformed(cage)
    op = ops.CageDeformationOp.from_tet_mesh(tm)
    pos = jnp.asarray([[0.72, 0.5, 0.5], [0.35, 0.5, 0.5], [0.1, 0.1, 0.1]])
    out, kill = ops.cage_map_positions(op, pos)
    np.testing.assert_allclose(np.asarray(out[0]), [0.47, 0.5, 0.5], atol=5e-3)
    assert bool(kill[1])  # vacated source
    assert not bool(kill[2])  # outside everything
    np.testing.assert_allclose(np.asarray(out[2]), [0.1, 0.1, 0.1], atol=1e-6)


def test_forward_map_for_distillation(cube_cage):
    cage = Cage.from_mesh(cube_mesh(0.3, 0.7))
    tm = TetMesh.from_cage(cage, ideal_edge=0.1)
    cage.translate([0.0, 0.15, 0.0])
    tm.update_deformed(cage)
    op = ops.CageDeformationOp.from_tet_mesh(tm)
    p = jnp.asarray([[0.5, 0.5, 0.5]])
    mapped, in_src = ops.cage_map_forward(op, p)
    assert bool(in_src[0])
    np.testing.assert_allclose(np.asarray(mapped[0]), [0.5, 0.65, 0.5], atol=5e-3)


def test_affine_duplication():
    op = ops.AffineDuplicationOp.create(
        center=[0.3, 0.3, 0.3], half_extents=[0.1, 0.1, 0.1],
        transform_t=[0.4, 0.0, 0.0], hide_original=False,
    )
    p = jnp.asarray([[0.7, 0.3, 0.3], [0.3, 0.3, 0.3], [0.9, 0.9, 0.9]])
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (3, 1))
    pos, dirs, empty, in_t = ops.affine_map_samples(op, p, d)
    assert bool(in_t[0])  # duplicate location
    np.testing.assert_allclose(np.asarray(pos[0]), [0.3, 0.3, 0.3], atol=1e-6)
    assert not bool(empty[1])  # original kept
    assert not bool(in_t[2])

    op_hide = ops.AffineDuplicationOp.create(
        center=[0.3, 0.3, 0.3], half_extents=[0.1, 0.1, 0.1],
        transform_t=[0.4, 0.0, 0.0], hide_original=True,
    )
    _, _, empty_h, _ = ops.affine_map_samples(op_hide, p, d)
    assert bool(empty_h[1])


def test_operator_stack_composition():
    op1 = ops.AffineDuplicationOp.create(
        center=[0.3, 0.3, 0.3], half_extents=[0.05] * 3, transform_t=[0.2, 0.0, 0.0]
    )
    pts = jnp.asarray([[0.5, 0.3, 0.3]])
    dirs = jnp.asarray([[0.0, 1.0, 0.0]])
    pos, _, empty = ops.map_samples_through_stack([op1], pts, dirs)
    np.testing.assert_allclose(np.asarray(pos[0]), [0.3, 0.3, 0.3], atol=1e-6)
