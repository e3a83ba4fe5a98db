"""GrowingSelection — the interactive cage-building pipeline state machine.

Reference: editing/tools/growing_selection.{h,cu} (the 6-stage pipeline
ScreenSelection → Projection → RegionGrowing → SelectionMesh → ProxyMesh →
TetMesh driven by GUI buttons PROJECT / GROW REGION / COMPUTE PROXY /
EXTRACT CAGE / Vanish! / Copy, growing_selection.cu:119-432).

Here the verbs are plain methods (headless-first; a GUI can call them 1:1).
The pipeline owns: scribble pixels → projected cells → grown selection →
fine mesh → proxy cage → tet mesh (+MVC), and hands a CageDeformationOp to
the render/training operator stack.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional

import numpy as np

from nerfshop_tpu.editing import selection as sel_lib
from nerfshop_tpu.editing.cage import Cage
from nerfshop_tpu.editing.operators import CageDeformationOp
from nerfshop_tpu.editing.tet_mesh import TetMesh
from nerfshop_tpu.geometry.mesh_io import TriMesh


class PipelineStage(Enum):
    ScreenSelection = 0
    Projection = 1
    RegionGrowing = 2
    SelectionMesh = 3
    ProxyMesh = 4
    TetMesh = 5


@dataclass
class GrowingSelection:
    model: object
    aabb: object  # BoundingBox
    cone_angle: float = 0.0
    stage: PipelineStage = PipelineStage.ScreenSelection

    # pipeline state
    projected_cells: Optional[np.ndarray] = None  # [N,4] (mip,ix,iy,iz)
    projected_points: Optional[np.ndarray] = None
    region: Optional[sel_lib.RegionGrowing] = None
    fine_mesh: Optional[TriMesh] = None
    proxy_cage: Optional[TriMesh] = None
    cage: Optional[Cage] = None
    tet_mesh: Optional[TetMesh] = None
    copy_mode: bool = False
    #: active Poisson membrane (editing/poisson.MembraneData) — attached to
    #: every operator make_operator builds until cleared
    membrane: Optional[object] = None

    # knobs (reference GUI sliders)
    density_threshold: float = 0.01
    transmittance_threshold: float = 1e-1
    target_cage_vertices: int = 100
    ideal_tet_edge: Optional[float] = None
    mm_size: int = 3

    def project(self, params, grid, origins: np.ndarray, directions: np.ndarray) -> int:
        """PROJECT: scribble rays → surface cells (E4). Returns #hits."""
        hit, pts, cells = sel_lib.project_selection_rays(
            self.model, params, grid,
            origins, directions, self.aabb, self.cone_angle,
            self.transmittance_threshold,
        )
        self.projected_points = pts[hit]
        self.projected_cells = np.unique(cells[hit], axis=0)
        self.stage = PipelineStage.Projection
        return int(hit.sum())

    def grow_region(self, grid, n_steps: int = 10000) -> int:
        """GROW REGION (E5)."""
        assert self.projected_cells is not None and len(self.projected_cells), "project first"
        if self.region is None:
            self.region = sel_lib.RegionGrowing(
                density=np.asarray(grid.density),
                density_threshold=self.density_threshold,
            )
            self.region.reset(self.projected_cells)
        grown = self.region.grow(n_steps)
        self.stage = PipelineStage.RegionGrowing
        return grown

    def set_selection(self, selection: np.ndarray, level: int = 0) -> None:
        """Skip scribbling: provide selection voxels directly (API path)."""
        self.region = sel_lib.RegionGrowing(density=np.zeros((level + 1, 128, 128, 128), np.float32))
        self.region.selection = selection.astype(bool)
        self.region.growing_level = level
        self.stage = PipelineStage.RegionGrowing

    def compute_proxy(self, use_box: bool = False) -> TriMesh:
        """COMPUTE PROXY (E7+E8): closing → fine mesh → bounding cage."""
        assert self.region is not None and self.region.selection.any(), "grow a region first"
        sel = sel_lib.closing(self.region.selection, self.mm_size)
        if not sel.any():
            sel = self.region.selection
        level = self.region.growing_level
        self.fine_mesh = sel_lib.extract_fine_mesh(sel, level)
        if use_box:
            self.proxy_cage = sel_lib.box_cage(sel, level)
        else:
            self.proxy_cage = sel_lib.compute_proxy_cage(sel, level, self.target_cage_vertices)
        self.stage = PipelineStage.ProxyMesh
        return self.proxy_cage

    def extract_cage(self) -> TetMesh:
        """EXTRACT CAGE: tetrahedralize + MVC (E9)."""
        assert self.proxy_cage is not None, "compute proxy first"
        self.cage = Cage.from_mesh(self.proxy_cage)
        self.tet_mesh = TetMesh.from_cage(self.cage, self.ideal_tet_edge)
        self.tet_mesh.update_deformed(self.cage)
        self.stage = PipelineStage.TetMesh
        return self.tet_mesh

    # ------------------------------------------------------------ interaction

    def translate_cage(self, offset, vertex_mask=None) -> None:
        assert self.cage is not None
        self.cage.translate(offset, vertex_mask)
        self.tet_mesh.update_deformed(self.cage)

    def transform_cage(self, matrix3x4, vertex_mask=None) -> None:
        assert self.cage is not None
        self.cage.transform(matrix3x4, vertex_mask)
        self.tet_mesh.update_deformed(self.cage)

    def set_cage_vertices(self, vertices: np.ndarray) -> None:
        assert self.cage is not None
        self.cage.vertices_deformed = np.asarray(vertices, np.float32)
        self.tet_mesh.update_deformed(self.cage)

    def select_cage_vertices(self, indices=None, box=None) -> np.ndarray:
        """Vertex-group selection → bool mask [V] (reference: rect/brush
        cage-vertex selection, growing_selection.cu:784-957). ``box``:
        world-space [[lo],[hi]] picks vertices of the DEFORMED cage inside."""
        assert self.cage is not None
        mask = np.zeros(self.cage.n_vertices, bool)
        if indices is not None:
            mask[np.asarray(indices, int)] = True
        if box is not None:
            b = np.asarray(box, np.float32)
            v = self.cage.vertices_deformed
            mask |= np.all((v >= b[0]) & (v <= b[1]), axis=1)
        return mask

    def transform_cage_group(
        self, indices=None, box=None, rotate_deg=None, scale=None, offset=None
    ) -> None:
        """Group gizmo: rotate (XYZ euler degrees) / scale / translate the
        selected vertex group about its centroid (reference: ImGuizmo group
        manipulate over the selected cage vertices,
        growing_selection.cu:459-658)."""
        mask = self.select_cage_vertices(indices, box)
        if not mask.any():
            mask = np.ones(self.cage.n_vertices, bool)
        v = self.cage.vertices_deformed[mask]
        c = v.mean(0)
        m = np.eye(3, dtype=np.float32)
        if rotate_deg is not None:
            rx, ry, rz = np.radians(np.asarray(rotate_deg, np.float32))
            cx, sx = np.cos(rx), np.sin(rx)
            cy, sy = np.cos(ry), np.sin(ry)
            cz, sz = np.cos(rz), np.sin(rz)
            Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float32)
            Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
            Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], np.float32)
            m = Rz @ Ry @ Rx
        if scale is not None:
            m = m * np.asarray(scale, np.float32)
        t = c - m @ c + (np.asarray(offset, np.float32) if offset is not None else 0.0)
        self.cage.transform(np.concatenate([m, t[:, None]], 1), vertex_mask=mask)
        self.tet_mesh.update_deformed(self.cage)

    def make_operator(self, lut_res: int = 64) -> CageDeformationOp:
        """→ device operator for the render/train stack (rebuild after every
        cage manipulation, like the reference's per-drag build_tet_grid).
        Attaches the computed membrane when one is active."""
        assert self.tet_mesh is not None, "extract cage first"
        op = CageDeformationOp.from_tet_mesh(self.tet_mesh, copy_mode=self.copy_mode, lut_res=lut_res)
        if self.membrane is not None:
            op = op._replace(membrane=self.membrane)
        return op

    def compute_membrane(self, params, rng, amplitude: float = 1.0, grid=None) -> None:
        """Build Poisson membrane boundary values for the CURRENT deformation
        and keep them on the selection (reference: the GUI's poisson section,
        growing_selection.cu:2220-2409 — recompute after each manipulation).
        Pass amplitude=0 or call clear_membrane() to turn it off."""
        from nerfshop_tpu.editing import poisson as poisson_lib

        assert self.tet_mesh is not None, "extract cage first"
        self.membrane = poisson_lib.compute_membrane(
            self.model, params, self.cage, self.tet_mesh, self.aabb, rng,
            amplitude=amplitude, grid=grid,
        )

    def clear_membrane(self) -> None:
        self.membrane = None

    # ------------------------------------------------------------------ vanish

    def vanish(self, grid):
        """Vanish!: zero density+occupancy in cells intersecting the deformed
        tets (E15, TetMesh::vanish tet_mesh.cu:251-363). Returns new grid.

        Uses the native threaded tet-accurate kernel (point-in-tet per cell
        center, like the reference); numpy bbox clearing is the fallback —
        coarser (clears the tets' bounding boxes) but conservative."""
        import jax.numpy as jnp

        from nerfshop_tpu import native
        from nerfshop_tpu.ops import grid as grid_lib

        assert self.tet_mesh is not None
        tm = self.tet_mesh
        density = np.array(grid.density)  # host copy
        C = density.shape[0]
        Rg = density.shape[1]
        for mip in range(C):
            scale = 2.0**mip
            lo = 0.5 - scale / 2
            cell_w = scale / Rg
            ok = native.clear_cells_in_tets(
                tm.vertices_deformed, tm.tets, Rg, lo, cell_w, density[mip]
            )
            if ok is None:
                # numpy fallback: clear per-tet bounding boxes (conservative)
                verts = tm.vertices_deformed[tm.tets]
                tl = np.clip(np.floor((verts.min(1) - lo) / cell_w).astype(int) - 1, 0, Rg - 1)
                th = np.clip(np.floor((verts.max(1) - lo) / cell_w).astype(int) + 1, 0, Rg - 1)
                for ti in range(len(verts)):
                    x0, y0, z0 = tl[ti]
                    x1, y1, z1 = th[ti]
                    density[mip, x0 : x1 + 1, y0 : y1 + 1, z0 : z1 + 1] = 0.0
        new = grid._replace(density=jnp.asarray(density))
        return grid_lib.update_bitfield(new)

    def to_json(self) -> dict:
        d = {"copy_mode": self.copy_mode}
        if self.cage is not None:
            d["cage"] = self.cage.to_json()
        if self.tet_mesh is not None:
            d["tet_mesh"] = self.tet_mesh.to_json()
        return d

    @staticmethod
    def from_json(d: dict, model=None, aabb=None) -> "GrowingSelection":
        gs = GrowingSelection(model=model, aabb=aabb)
        gs.copy_mode = d.get("copy_mode", False)
        if "cage" in d:
            gs.cage = Cage.from_json(d["cage"])
        if "tet_mesh" in d:
            gs.tet_mesh = TetMesh.from_json(d["tet_mesh"])
            gs.stage = PipelineStage.TetMesh
        return gs
