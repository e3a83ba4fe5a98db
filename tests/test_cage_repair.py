"""Cage repair (meshfix equivalent) + refinement loop (E8 parity:
fix_proxy_mesh growing_selection.cu:1187, cage refinement)."""

import numpy as np

from nerfshop_tpu.editing import selection
from nerfshop_tpu.geometry.mesh_io import TriMesh
from nerfshop_tpu.editing.selection import make_box_mesh


def _count_boundary_edges(mesh: TriMesh) -> int:
    from collections import defaultdict

    c = defaultdict(int)
    for a, b, cc in mesh.faces:
        for e in ((a, b), (b, cc), (cc, a)):
            c[(min(e), max(e))] += 1
    return sum(1 for n in c.values() if n == 1)


class TestFixProxyMesh:
    def test_clean_mesh_unchanged_topology(self):
        box = make_box_mesh(np.zeros(3), np.ones(3))
        fixed = selection.fix_proxy_mesh(box)
        assert fixed.n_vertices == 8 and fixed.n_faces == 12
        assert _count_boundary_edges(fixed) == 0

    def test_duplicate_faces_removed(self):
        box = make_box_mesh(np.zeros(3), np.ones(3))
        faces = np.concatenate([box.faces, box.faces[:3]])
        fixed = selection.fix_proxy_mesh(TriMesh(box.vertices, faces))
        assert fixed.n_faces == 12

    def test_degenerate_faces_removed(self):
        box = make_box_mesh(np.zeros(3), np.ones(3))
        bad = np.array([[0, 0, 1], [2, 2, 2]], np.int32)
        fixed = selection.fix_proxy_mesh(TriMesh(box.vertices, np.concatenate([box.faces, bad])))
        assert fixed.n_faces == 12

    def test_near_duplicate_vertices_welded(self):
        box = make_box_mesh(np.zeros(3), np.ones(3))
        # duplicate vertex 0 with a tiny offset and point one face at it
        v = np.concatenate([box.vertices, box.vertices[:1] + 1e-7])
        f = box.faces.copy()
        f[f == 0] = 8  # reroute to the near-duplicate
        fixed = selection.fix_proxy_mesh(TriMesh(v.astype(np.float32), f))
        assert fixed.n_vertices == 8
        assert _count_boundary_edges(fixed) == 0

    def test_hole_filled(self):
        box = make_box_mesh(np.zeros(3), np.ones(3))
        # remove one face → 3 boundary edges; repair should close the hole
        holed = TriMesh(box.vertices, box.faces[1:])
        fixed = selection.fix_proxy_mesh(holed)
        assert _count_boundary_edges(fixed) == 0

    def test_nonmanifold_fin_removed(self):
        box = make_box_mesh(np.zeros(3), np.ones(3))
        # add a tiny fin: a 9th vertex above an existing edge with a face
        v = np.concatenate([box.vertices, [[0.5, 0.5, 2.0]]]).astype(np.float32)
        e = box.faces[0][:2]
        fin = np.array([[e[0], e[1], 8]], np.int32)
        fixed = selection.fix_proxy_mesh(TriMesh(v, np.concatenate([box.faces, fin])))
        # the fin face (small area, non-manifold edge) must be gone
        assert fixed.n_faces == 12 and fixed.n_vertices == 8


class TestRefineCage:
    def test_refinement_adds_resolution_and_keeps_containment(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0.25, 0.75, (500, 3)).astype(np.float32)
        cage = make_box_mesh(np.full(3, 0.2), np.full(3, 0.8))
        refined = selection.refine_cage(cage, pts, iters=2)
        assert refined.n_faces > cage.n_faces
        # containment: all points stay inside (signed distance < 0)
        import jax.numpy as jnp

        from nerfshop_tpu.geometry import bvh as bvh_lib

        bvh = bvh_lib.build_bvh(refined.vertices, refined.faces)
        sd = np.asarray(bvh_lib.signed_distance(bvh, jnp.asarray(pts)))
        assert (sd < 1e-4).all()
        assert _count_boundary_edges(refined) == 0
