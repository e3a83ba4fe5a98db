"""Tetrahedral proxy mesh + spatial LUT for cage deformation.

Reference counterpart: editing/datastructures/tet_mesh.{h,cu} (tetgen-built
tet mesh, MVC-driven vertex updates, per-tet SVD rotations, 32-thread CPU
voxelization into per-cascade CSR LUTs) and the warp kernels in
cage_deformation.cu (interpolate_tet 197-269, point-in-tet via same_side
tests, barycentric mapping).

TPU re-design:

* **tetrahedralization**: cage interior is filled with scipy.spatial
  Delaunay over (cage vertices + an interior jittered grid at the ideal
  edge length), keeping tets whose centroid is inside the cage (signed
  distance via the cage BVH). Replaces TetGen.
* **LUT**: ONE local uniform grid over the deformed-region bounding box
  (default 64³) with fixed-fanout cells ([n_cells, MAX_T] tet ids, padded
  with -1) instead of per-cascade CSR — static shapes for the device warp.
* **point-in-tet**: precomputed inverse edge matrices → barycentrics in one
  [batch, MAX_T] einsum; first containing tet wins (argmax over a mask),
  no device-side virtual calls.
* **rotations**: per-tet polar rotation (SVD) between original and deformed
  edge frames, used to rotate view directions (update_local_rotations,
  tet_mesh.cu:38-74).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import numpy as np

from nerfshop_tpu.editing.cage import Cage

LUT_RES_DEFAULT = 64
MAX_TETS_PER_CELL = 24


class TetLut(NamedTuple):
    """Device pytree: local uniform grid → candidate tets."""

    bbox_lo: "jnp.ndarray"  # [3]
    inv_cell: "jnp.ndarray"  # [3]
    cells: "jnp.ndarray"  # [res³, MAX_T] int32 tet ids, -1 padded
    res: int


@dataclass
class TetMesh:
    vertices_original: np.ndarray  # [T, 3]
    vertices_deformed: np.ndarray  # [T, 3]
    tets: np.ndarray  # [Nt, 4] int32
    mvc_weights: Optional[np.ndarray] = None  # [T, Vcage]
    boundary_mask: Optional[np.ndarray] = None  # [T] verts on the cage surface
    #: for tet verts that ARE cage vertices: the cage vertex index, else -1 —
    #: these verts follow the cage exactly (no MVC reconstruction error)
    cage_vertex_id: Optional[np.ndarray] = None
    rotations: Optional[np.ndarray] = None  # [Nt, 3, 3] original→deformed

    @property
    def n_tets(self) -> int:
        return len(self.tets)

    # ------------------------------------------------------------------ build

    @staticmethod
    def from_cage(cage: Cage, ideal_edge: Optional[float] = None, max_interior_points: int = 20000) -> "TetMesh":
        """Tetrahedralize the cage interior (reference: extract_tet_mesh
        growing_selection.cu:1514-1597, TetGen flags Qpq2.0a<vol>)."""
        from scipy.spatial import Delaunay

        from nerfshop_tpu.geometry import bvh as bvh_lib

        import jax.numpy as jnp

        cv = cage.vertices_original
        lo, hi = cv.min(0), cv.max(0)
        diag = float(np.linalg.norm(hi - lo))
        if ideal_edge is None:
            ideal_edge = diag / 8.0

        # interior candidate points on a jittered grid
        ns = np.maximum(((hi - lo) / ideal_edge).astype(int) + 1, 2)
        axes = [lo[k] + (np.arange(ns[k]) + 0.5) / ns[k] * (hi[k] - lo[k]) for k in range(3)]
        gx, gy, gz = np.meshgrid(*axes, indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
        rng = np.random.default_rng(0)
        pts += (rng.uniform(-0.1, 0.1, pts.shape) * ideal_edge).astype(np.float32)

        bvh = bvh_lib.build_bvh(cage.vertices_original, cage.faces)
        sd = np.asarray(bvh_lib.signed_distance(bvh, jnp.asarray(pts)))
        interior = pts[sd < -0.05 * ideal_edge]
        if len(interior) > max_interior_points:
            interior = interior[rng.choice(len(interior), max_interior_points, replace=False)]

        # boundary refinement: points just INSIDE each cage face (centers +
        # edge midpoints pushed along −normal) so concave boundaries get
        # hugging tets — Delaunay + centroid culling alone leaves coverage
        # holes at concavities (TetGen's constrained tetrahedralization is
        # conforming by construction; this recovers that property to within
        # a fraction of the ideal edge)
        fv = cv[cage.faces]  # [F, 3, 3]
        fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        fn /= np.linalg.norm(fn, axis=1, keepdims=True) + 1e-12
        push = 0.25 * ideal_edge
        face_pts = [fv.mean(1) - fn * push]
        for a, b in ((0, 1), (1, 2), (2, 0)):
            face_pts.append((fv[:, a] + fv[:, b]) / 2 - fn * push)
        face_pts = np.concatenate(face_pts).astype(np.float32)
        sd_f = np.asarray(bvh_lib.signed_distance(bvh, jnp.asarray(face_pts)))
        face_pts = face_pts[sd_f < 0]

        all_pts = np.concatenate([cv, interior, face_pts]).astype(np.float64)
        dela = Delaunay(all_pts)
        tets = dela.simplices.astype(np.int32)

        # keep tets whose centroid is inside the cage, with a small tolerance
        # halo (a slightly-outside sliver tet at a concave crease beats a
        # coverage hole — the warp there is MVC-smooth and bounded)
        cent = all_pts[tets].mean(1).astype(np.float32)
        sd_c = np.asarray(bvh_lib.signed_distance(bvh, jnp.asarray(cent)))
        tets = tets[sd_c < 0.05 * ideal_edge]

        # drop degenerate tets
        v = all_pts[tets]
        vol = np.einsum(
            "ij,ij->i",
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]),
            v[:, 3] - v[:, 0],
        ) / 6.0
        keep = np.abs(vol) > 1e-12
        tets = tets[keep]
        # enforce positive orientation
        v = all_pts[tets]
        vol = np.einsum("ij,ij->i", np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), v[:, 3] - v[:, 0])
        flip = vol < 0
        tets[flip] = tets[flip][:, [0, 1, 3, 2]]

        # keep only referenced vertices
        used = np.unique(tets)
        remap = np.full(len(all_pts), -1, np.int64)
        remap[used] = np.arange(len(used))
        verts = all_pts[used].astype(np.float32)
        tets = remap[tets].astype(np.int32)
        cage_ids = np.full(len(used), -1, np.int64)
        for ci in range(len(cv)):
            ni = remap[ci]
            if ni >= 0:
                cage_ids[ni] = ci
        boundary = cage_ids >= 0

        tm = TetMesh(
            vertices_original=verts,
            vertices_deformed=verts.copy(),
            tets=tets,
            boundary_mask=boundary,
            cage_vertex_id=cage_ids,
        )
        tm.initialize_mvc(cage)
        return tm

    # ------------------------------------------------------- deformation flow

    def initialize_mvc(self, cage: Cage, gamma: float = 1.0) -> None:
        """MVC of every tet vertex w.r.t. the cage
        (initialize_mvc growing_selection.cu:1599)."""
        self.mvc_weights = cage.compute_mvc(self.vertices_original, gamma=gamma)

    def update_deformed(self, cage: Cage) -> None:
        """Cage moved → move tet verts by MVC, refresh rotations
        (update_tet_mesh growing_selection.cu:1615). Tet verts that ARE cage
        vertices follow the cage exactly, eliminating the thin MVC
        reconstruction-error shell at the surface."""
        assert self.mvc_weights is not None
        self.vertices_deformed = cage.interpolate_deformed(self.mvc_weights).astype(np.float32)
        if self.cage_vertex_id is not None:
            on_cage = self.cage_vertex_id >= 0
            self.vertices_deformed[on_cage] = cage.vertices_deformed[self.cage_vertex_id[on_cage]]
        self.update_local_rotations()

    def update_local_rotations(self) -> None:
        """Per-tet polar rotation original→deformed (SVD of the edge-frame
        covariance; update_local_rotations tet_mesh.cu:38-74)."""
        vo = self.vertices_original[self.tets]  # [Nt, 4, 3]
        vd = self.vertices_deformed[self.tets]
        eo = vo[:, 1:] - vo[:, :1]  # [Nt, 3, 3] rows = edges
        ed = vd[:, 1:] - vd[:, :1]
        h = np.einsum("nki,nkj->nij", eo, ed)  # covariance
        u, _, vt = np.linalg.svd(h)
        r = np.einsum("nij,njk->nik", u, vt)
        det = np.linalg.det(r)
        u2 = u.copy()
        u2[:, :, -1] *= np.sign(det)[:, None]
        self.rotations = np.einsum("nij,njk->nik", u2, vt).transpose(0, 2, 1).astype(np.float32)
        # rotations[n] maps original edge directions → deformed directions

    # --------------------------------------------------------------- LUT build

    def _voxelize(self, verts: np.ndarray, res: int, max_t: int, use_native: bool = True):
        """Conservative voxelization into a local grid: tet-bbox overlap
        REFINED by the tet's four face planes (a cell entirely outside any
        outward face plane, beyond the 1-cell near-miss margin, cannot
        contain or nearly-contain a point of the tet).

        The plane refinement matters a lot: bbox-only voxelization gives
        per-cell fanouts of 100+ for typical cages (every cell under a long
        sliver tet's bbox lists it), which blew both the device warp's
        candidate loop and its memory. Face-plane filtering brings fanout to
        the actual local tet overlap (~10-30) — the same count the
        reference's exact per-cell rasterizer reaches (tet_mesh.cu:369)."""
        tv = verts[self.tets]  # [Nt, 4, 3]
        lo = tv.min((0, 1)) - 1e-4
        hi = tv.max((0, 1)) + 1e-4
        inv_cell = res / np.maximum(hi - lo, 1e-9)
        cell_size = 1.0 / inv_cell

        # native multithreaded kernel (host_ops.cpp voxelize_tets — same
        # face-plane refinement + margin arithmetic as the numpy path below,
        # deterministic ascending per-cell order; the reference rebuilds its
        # LUT per gizmo drag on 32 threads, tet_mesh.cu:369). Python stays
        # as the fallback and the equivalence oracle (tests/test_native.py).
        from nerfshop_tpu import native as native_lib

        out = None if not use_native else native_lib.voxelize_tets(
            np.ascontiguousarray(verts, np.float32),
            np.ascontiguousarray(self.tets, np.int32),
            res,
            lo.astype(np.float32),
            inv_cell.astype(np.float32),
            max_t,
        )
        if out is not None:
            cells, max_seen = out
            # trim to the observed fanout like the python path: the warp's
            # candidate loop is bounded by the LUT width
            mt = min(max(max_seen, 1), max_t)
            cells = np.ascontiguousarray(cells[:, :mt])
            return lo.astype(np.float32), inv_cell.astype(np.float32), cells, max_seen

        # outward face normals: face f is opposite vertex f
        faces = np.array([[1, 2, 3], [0, 3, 2], [0, 1, 3], [0, 2, 1]])
        a = tv[:, faces[:, 0]]  # [Nt, 4, 3]
        n = np.cross(tv[:, faces[:, 1]] - a, tv[:, faces[:, 2]] - a)  # [Nt,4,3]
        opp = tv[:, [0, 1, 2, 3]]
        flip = np.einsum("nfd,nfd->nf", n, opp - a) > 0  # orient outward
        n = np.where(flip[..., None], -n, n)
        d = np.einsum("nfd,nfd->nf", n, a)  # plane: x·n ≤ d inside

        cell_lists: list = [[] for _ in range(res**3)]
        # 1-cell padding so neighbors keep the tet as a near-miss candidate
        t_lo = np.clip(((tv.min(1) - lo) * inv_cell).astype(int) - 1, 0, res - 1)
        t_hi = np.clip(((tv.max(1) - lo) * inv_cell).astype(int) + 1, 0, res - 1)
        half = cell_size * 0.5
        margin = np.linalg.norm(cell_size)  # near-miss slack (~1 cell)
        for ti in range(len(self.tets)):
            x0, y0, z0 = t_lo[ti]
            x1, y1, z1 = t_hi[ti]
            xs = (np.arange(x0, x1 + 1) + 0.5) * cell_size[0] + lo[0]
            ys = (np.arange(y0, y1 + 1) + 0.5) * cell_size[1] + lo[1]
            zs = (np.arange(z0, z1 + 1) + 0.5) * cell_size[2] + lo[2]
            cx, cy, cz = np.meshgrid(xs, ys, zs, indexing="ij")
            centers = np.stack([cx, cy, cz], -1).reshape(-1, 3)
            nt, dt_ = n[ti], d[ti]  # [4,3], [4]
            proj = centers @ nt.T  # [C, 4]
            slack = np.abs(nt) @ half + margin * np.linalg.norm(nt, axis=1)
            keep = np.all(proj - slack[None] <= dt_[None], axis=1)
            idx = np.stack(
                np.meshgrid(
                    np.arange(x0, x1 + 1), np.arange(y0, y1 + 1), np.arange(z0, z1 + 1),
                    indexing="ij",
                ),
                -1,
            ).reshape(-1, 3)[keep]
            for x, y, z in idx:
                cell_lists[(x * res + y) * res + z].append(ti)

        max_seen = max((len(c) for c in cell_lists), default=0)
        mt = min(max(max_seen, 1), max_t)
        cells = np.full((res**3, mt), -1, np.int32)
        for ci, lst in enumerate(cell_lists):
            k = min(len(lst), mt)
            cells[ci, :k] = lst[:k]
        return lo.astype(np.float32), inv_cell.astype(np.float32), cells, max_seen

    def _voxelize_full(self, verts: np.ndarray, res: int, max_t: int, max_t_cap: int = 256):
        """Voxelize, growing the fanout until nothing truncates (the
        reference tracks max_tet_lookup, tet_mesh.h:69 — silently dropping
        candidate tets makes warps miss containing tets)."""
        while True:
            lo, ic, cells, max_seen = self._voxelize(verts, res, max_t)
            if max_seen <= max_t or max_t >= max_t_cap:
                if max_seen > max_t:
                    import warnings

                    warnings.warn(
                        f"tet LUT fanout {max_seen} exceeds cap {max_t}; some cells truncate"
                    )
                return lo, ic, cells
            max_t = min(max(max_seen, max_t * 2), max_t_cap)

    def build_luts(self, res: int = LUT_RES_DEFAULT, max_t: int = MAX_TETS_PER_CELL):
        """→ (deformed LUT, original LUT) as device pytrees
        (build_tet_grid / build_original_tet_grid, tet_mesh.cu:369/77)."""
        import jax.numpy as jnp

        lo_d, ic_d, cells_d = self._voxelize_full(self.vertices_deformed, res, max_t)
        lo_o, ic_o, cells_o = self._voxelize_full(self.vertices_original, res, max_t)
        lut_d = TetLut(jnp.asarray(lo_d), jnp.asarray(ic_d), jnp.asarray(cells_d), res)
        lut_o = TetLut(jnp.asarray(lo_o), jnp.asarray(ic_o), jnp.asarray(cells_o), res)
        return lut_d, lut_o

    # ------------------------------------------------------------------- misc

    def device_arrays(self):
        """Per-tet arrays the warp kernel needs, as a dict of jnp arrays."""
        import jax.numpy as jnp

        vo = self.vertices_original[self.tets]  # [Nt,4,3]
        vd = self.vertices_deformed[self.tets]

        def inv_edges(tv):
            e = np.stack([tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0], tv[:, 3] - tv[:, 0]], -1)
            return np.linalg.inv(e + 1e-12 * np.eye(3)[None])

        rot = self.rotations if self.rotations is not None else np.tile(np.eye(3, dtype=np.float32)[None], (self.n_tets, 1, 1))
        return {
            "v0_def": jnp.asarray(vd[:, 0]),
            "inv_def": jnp.asarray(inv_edges(vd).astype(np.float32)),
            "v0_orig": jnp.asarray(vo[:, 0]),
            "inv_orig": jnp.asarray(inv_edges(vo).astype(np.float32)),
            "verts_orig": jnp.asarray(vo),
            "verts_def": jnp.asarray(vd),
            "rot": jnp.asarray(rot),
        }

    def to_json(self) -> dict:
        return {
            "vertices_original": self.vertices_original.tolist(),
            "vertices_deformed": self.vertices_deformed.tolist(),
            "tets": self.tets.tolist(),
            "mvc_weights": None if self.mvc_weights is None else self.mvc_weights.tolist(),
        }

    @staticmethod
    def from_json(d: dict) -> "TetMesh":
        tm = TetMesh(
            np.asarray(d["vertices_original"], np.float32),
            np.asarray(d["vertices_deformed"], np.float32),
            np.asarray(d["tets"], np.int32),
            mvc_weights=None if d.get("mvc_weights") is None else np.asarray(d["mvc_weights"], np.float32),
        )
        tm.update_local_rotations()
        return tm
