"""Selection machinery: scribble projection, region growing, morphology,
fine-mesh extraction, proxy-cage computation.

Reference counterparts (src/editing/tools/):
* scribble projection — shoot_selection_rays/composite_shot_rays/
  project_selection_pixels (growing_selection.cu:1673-2035): march scribbled
  pixels, composite density until transmittance < threshold → surface cells;
* region growing — RegionGrowing (region_growing.{h,cu}): host BFS flood
  fill over the density grid, cascade auto-upscale;
* morphological ops — MMOperations (dilation/erosion, cube/sphere
  structuring elements); we use scipy.ndimage;
* fine mesh — extract_fine_mesh (growing_selection.cu:2096): binary voxel
  field → isosurface (marching tets here);
* proxy cage — compute_proxy_mesh + progressive hulls + meshfix
  (growing_selection.cu:981-1230, progressive_hulls.cu): replaced by a
  robust host pipeline: dilate selection → low-res isosurface →
  vertex-clustering decimation → outward inflation until the cage BOUNDS
  the selection (the progressive-hulls containment guarantee, enforced
  directly instead of per-edge-collapse LP).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from nerfshop_tpu.common import GRID_RESOLUTION
from nerfshop_tpu.geometry import isosurface
from nerfshop_tpu.geometry.mesh_io import TriMesh

R = GRID_RESOLUTION


# ---------------------------------------------------------------------------
# Scribble projection (E4)
# ---------------------------------------------------------------------------


def project_selection_rays(
    model,
    params,
    grid,
    origins: np.ndarray,
    directions: np.ndarray,
    aabb,
    cone_angle: float = 0.0,
    transmittance_threshold: float = 1e-1,
    k_samples: int = 128,
):
    """March scribble rays, composite density only, return the first point
    where transmittance drops below the threshold (the 'surface' hit).

    → (hit_mask [N], points [N,3] world, cells [N,4] (mip,ix,iy,iz))."""
    import jax.numpy as jnp

    from nerfshop_tpu.ops import coords, march

    origins = jnp.asarray(origins, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32)
    # STRATIFIED spread over the whole occupied path: cameras inside a
    # large-aabb_scale scene start marching at t≈0, and "first"-K samples
    # would all land in near-camera free space — the surface beyond never
    # accumulates opacity and every scribble missed (fox, aabb_scale 4)
    samples = march.march_rays(
        origins, directions, grid.occupancy, aabb.min, aabb.max,
        jnp.asarray(cone_angle), k_samples=k_samples,
        density_grid=grid.density, use_grid_early_stop=True,
        selection="spread", t_start_min=0.05,
    )
    Rn, K = samples.t.shape
    pos_w, _ = march.samples_to_network_inputs(samples, origins, directions, aabb)
    sigma = model.density(params, pos_w.reshape(-1, 3)).reshape(Rn, K)
    tau = jnp.cumsum(jnp.where(samples.valid, sigma * samples.dt, 0.0), axis=1)
    T = jnp.exp(-tau)
    crossed = T < transmittance_threshold  # [N, K]
    hit = crossed.any(axis=1)
    first = jnp.argmax(crossed, axis=1)
    t_hit = jnp.take_along_axis(samples.t, first[:, None], axis=1)[:, 0]
    points = origins + t_hit[:, None] * directions

    mip = coords.mip_from_pos(points, grid.occupancy.shape[0])
    cell = coords.cascaded_grid_coords(points, mip)
    cells = jnp.concatenate([mip[:, None], cell], axis=-1)
    return np.asarray(hit), np.asarray(points), np.asarray(cells)


# ---------------------------------------------------------------------------
# Region growing (E5) — host BFS like the reference
# ---------------------------------------------------------------------------


@dataclass
class RegionGrowing:
    """Flood fill over one cascade of the density grid
    (region_growing.{h,cu}: reset 10, upscale 57, grow 93)."""

    density: np.ndarray  # [C, R, R, R] host copy
    growing_level: int = 0
    density_threshold: float = 0.01
    selection: np.ndarray = None  # [R, R, R] bool at growing_level
    queue: list = field(default_factory=list)

    def reset(self, seed_cells: np.ndarray, level: Optional[int] = None) -> None:
        """seed_cells: [N, 4] (mip, ix, iy, iz) from projection."""
        if level is None:
            level = int(seed_cells[:, 0].max()) if len(seed_cells) else 0
        self.growing_level = level
        self.selection = np.zeros((R, R, R), bool)
        self.queue = []
        for m, x, y, z in seed_cells:
            c = self._to_level(int(m), (int(x), int(y), int(z)), level)
            if c is not None:
                self.queue.append(c)

    def _to_level(self, mip: int, cell, level: int):
        """Re-index a cell of cascade ``mip`` into cascade ``level``."""
        if mip == level:
            return tuple(cell)
        # world position of cell center in cascade mip → cell at level
        p = (np.asarray(cell, np.float64) + 0.5) / R
        p = (p - 0.5) * (2.0**mip) + 0.5  # world
        q = (p - 0.5) * (2.0**-level) + 0.5
        c = np.floor(q * R).astype(int)
        if (c < 0).any() or (c >= R).any():
            return None
        return tuple(c)

    def grow(self, n_steps: int = 10000) -> int:
        """BFS accept-if-dense; returns number of accepted cells.
        Native C++ flood fill when available, python BFS otherwise."""
        dens = self.density[self.growing_level]

        from nerfshop_tpu import native

        if self.queue and native.get_lib() is not None:
            seeds = np.asarray(
                [(x * R + y) * R + z for (x, y, z) in self.queue], np.int32
            )
            sel_u8 = self.selection.astype(np.uint8)
            grown_n = native.region_grow(dens, sel_u8, seeds, self.density_threshold, n_steps)
            if grown_n is not None:
                self.selection = sel_u8.astype(bool)
                self.queue = []
                if self._touches_boundary() and self.growing_level + 1 < self.density.shape[0]:
                    self.upscale()
                return grown_n

        grown = 0
        steps = 0
        while self.queue and steps < n_steps:
            steps += 1
            x, y, z = self.queue.pop(0)
            if self.selection[x, y, z]:
                continue
            if dens[x, y, z] < self.density_threshold:
                continue
            self.selection[x, y, z] = True
            grown += 1
            for dx, dy, dz in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
                nx, ny, nz = x + dx, y + dy, z + dz
                if 0 <= nx < R and 0 <= ny < R and 0 <= nz < R and not self.selection[nx, ny, nz]:
                    self.queue.append((nx, ny, nz))
        # auto-upscale if the region touches the cascade boundary
        if self._touches_boundary() and self.growing_level + 1 < self.density.shape[0]:
            self.upscale()
        return grown

    def _touches_boundary(self) -> bool:
        s = self.selection
        return bool(s[0].any() or s[-1].any() or s[:, 0].any() or s[:, -1].any() or s[:, :, 0].any() or s[:, :, -1].any())

    def upscale(self) -> None:
        """Move selection + queue one cascade coarser (region touches the
        128³ boundary; region_growing.cu:57)."""
        new_sel = np.zeros((R, R, R), bool)
        xs, ys, zs = np.nonzero(self.selection)
        nx = (xs - R // 2) // 2 + R // 2
        ny = (ys - R // 2) // 2 + R // 2
        nz = (zs - R // 2) // 2 + R // 2
        new_sel[nx, ny, nz] = True
        self.queue = [
            ((x - R // 2) // 2 + R // 2, (y - R // 2) // 2 + R // 2, (z - R // 2) // 2 + R // 2)
            for (x, y, z) in self.queue
        ]
        self.selection = new_sel
        self.growing_level += 1


# ---------------------------------------------------------------------------
# Morphology (E6)
# ---------------------------------------------------------------------------


def _structuring_element(size: int, sphere: bool) -> np.ndarray:
    if not sphere:
        return np.ones((size, size, size), bool)
    r = (size - 1) / 2
    g = np.arange(size) - r
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return x**2 + y**2 + z**2 <= r**2 + 1e-6


def dilate(selection: np.ndarray, size: int = 3, sphere: bool = False) -> np.ndarray:
    from scipy import ndimage

    return ndimage.binary_dilation(selection, structure=_structuring_element(size, sphere))


def erode(selection: np.ndarray, size: int = 3, sphere: bool = False) -> np.ndarray:
    from scipy import ndimage

    return ndimage.binary_erosion(selection, structure=_structuring_element(size, sphere))


def closing(selection: np.ndarray, size: int = 3, sphere: bool = False) -> np.ndarray:
    """dilate + erode — auto-run before meshing (growing_selection.cu:2098)."""
    return erode(dilate(selection, size, sphere), size, sphere)


# ---------------------------------------------------------------------------
# Fine mesh (E7) + proxy cage (E8)
# ---------------------------------------------------------------------------


def selection_to_world_box(level: int) -> Tuple[np.ndarray, np.ndarray]:
    """World-space bounds of cascade ``level``'s grid."""
    half = 0.5 * (2.0**level)
    lo = np.asarray([0.5 - half] * 3)
    hi = np.asarray([0.5 + half] * 3)
    return lo, hi


def extract_fine_mesh(selection: np.ndarray, level: int, smooth_iters: int = 1) -> TriMesh:
    """Binary selection voxels → surface mesh in world coords
    (extract_fine_mesh growing_selection.cu:2096-2162)."""
    from scipy import ndimage

    fld = selection.astype(np.float32)
    for _ in range(smooth_iters):
        fld = ndimage.uniform_filter(fld, 3)
    lo, hi = selection_to_world_box(level)
    spacing = (hi - lo) / R
    mesh = isosurface.marching_tets(fld, iso=0.5, origin=lo + spacing / 2, spacing=spacing)
    return mesh


def vertex_cluster_decimate(mesh: TriMesh, target_vertices: int = 100) -> TriMesh:
    """Uniform-grid vertex clustering decimation (replaces igl::decimate +
    progressive hulls as the coarsening step; containment is enforced
    separately by inflate_to_bound)."""
    if mesh.n_vertices <= target_vertices:
        return mesh
    lo = mesh.vertices.min(0) - 1e-6
    hi = mesh.vertices.max(0) + 1e-6
    # pick the grid resolution so the cluster count lands near the target
    res = max(2, int(round(target_vertices ** (1 / 3) * 1.2)))
    for _ in range(24):
        cell = np.floor((mesh.vertices - lo) / (hi - lo) * res).astype(np.int64)
        cell = np.clip(cell, 0, res - 1)
        key = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
        uniq, inverse = np.unique(key, return_inverse=True)
        if len(uniq) <= target_vertices or res <= 2:
            break
        res -= 1
    # new vertex = cluster centroid
    nv = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq), np.int64)
    np.add.at(nv, inverse, mesh.vertices)
    np.add.at(cnt, inverse, 1)
    nv = (nv / cnt[:, None]).astype(np.float32)
    faces = inverse[mesh.faces]
    keep = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    faces = faces[keep]
    # dedupe faces regardless of winding
    key_f = np.sort(faces, 1)
    _, idx = np.unique(key_f, axis=0, return_index=True)
    return TriMesh(nv, faces[np.sort(idx)].astype(np.int32))


def inflate_to_bound(cage: TriMesh, points: np.ndarray, margin: float = 0.0, iters: int = 20) -> TriMesh:
    """Push cage vertices outward along vertex normals until every selection
    point is inside (the progressive-hulls bounding guarantee,
    progressive_hulls.cu's raison d'être, enforced a-posteriori)."""
    import jax.numpy as jnp

    from nerfshop_tpu.geometry import bvh as bvh_lib

    verts = cage.vertices.copy()
    if len(points) == 0:
        return TriMesh(verts, cage.faces)
    step = 0.02 * float(np.linalg.norm(verts.max(0) - verts.min(0)))
    for _ in range(iters):
        m = TriMesh(verts, cage.faces)
        bvh = bvh_lib.build_bvh(verts, cage.faces)
        sd = np.asarray(bvh_lib.signed_distance(bvh, jnp.asarray(points.astype(np.float32))))
        worst = sd.max()
        if worst < -margin:
            break
        vn = m.vertex_normals()
        verts = verts + vn * max(worst + margin, step * 0.5)
    return TriMesh(verts.astype(np.float32), cage.faces)


def fix_proxy_mesh(mesh: TriMesh, weld_eps: float = 1e-5) -> TriMesh:
    """Repair a decimated cage so it is a clean closed manifold — the
    MeshFix step of the reference pipeline (fix_proxy_mesh,
    growing_selection.cu:1187). Conservative numpy equivalent:

    1. weld vertices closer than ``weld_eps`` · bbox diagonal,
    2. drop degenerate and duplicate faces,
    3. at non-manifold edges (>2 incident faces) keep the two largest-area
       faces and drop the rest,
    4. keep the largest connected component, re-orient windings outward,
    5. fill remaining simple boundary loops by fan triangulation.
    """
    if mesh.n_faces == 0:
        return mesh
    v = mesh.vertices.astype(np.float64)
    scale = float(np.linalg.norm(v.max(0) - v.min(0)) + 1e-12)
    # 1. weld
    keys = np.round(v / (weld_eps * scale)).astype(np.int64)
    _, uniq_idx, inverse = np.unique(keys, axis=0, return_index=True, return_inverse=True)
    v = v[uniq_idx]
    f = inverse[mesh.faces]
    # 2. degenerate + duplicate faces
    keep = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    f = f[keep]
    if len(f) == 0:
        return TriMesh(v.astype(np.float32), np.zeros((0, 3), np.int32))
    _, idx = np.unique(np.sort(f, 1), axis=0, return_index=True)
    f = f[np.sort(idx)]
    # 3. non-manifold edges: keep the two best-supported faces per edge.
    # Support = how many of a face's OTHER edges are cleanly 2-manifold —
    # a fin/flap typically dangles with boundary edges, so it loses to the
    # surface proper regardless of its area (area only tie-breaks).
    from collections import defaultdict

    area = 0.5 * np.linalg.norm(
        np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]]), axis=-1
    )
    edge_faces = defaultdict(list)
    for fi, (a, b, c) in enumerate(f):
        for e in ((a, b), (b, c), (c, a)):
            edge_faces[(min(e), max(e))].append(fi)

    def support(fi, skip_edge):
        s = 0
        a, b, c = f[fi]
        for e in ((a, b), (b, c), (c, a)):
            key = (min(e), max(e))
            if key != skip_edge and len(edge_faces[key]) == 2:
                s += 1
        return s

    drop = set()
    for e, fis in edge_faces.items():
        if len(fis) > 2:
            fis_sorted = sorted(fis, key=lambda i: (-support(i, e), -area[i]))
            drop.update(fis_sorted[2:])
    if drop:
        f = f[[i for i in range(len(f)) if i not in drop]]
    m = largest_component(TriMesh(v.astype(np.float32), f.astype(np.int32)))
    m = isosurface.orient_consistently(m)
    # 5. fill boundary loops (edges with exactly one incident face)
    edge_count = defaultdict(int)
    directed = {}
    for a, b, c in m.faces:
        for e in ((a, b), (b, c), (c, a)):
            edge_count[(min(e), max(e))] += 1
            directed[e] = True
    boundary = [e for e, n in edge_count.items() if n == 1]
    if boundary:
        # orient boundary edges opposite to their face's direction
        nxt = {}
        for a, b in boundary:
            if (a, b) in directed:
                nxt[b] = a  # boundary traversed against face winding
            else:
                nxt[a] = b
        new_faces = []
        visited = set()
        for start in list(nxt):
            if start in visited or start not in nxt:
                continue
            loop = [start]
            visited.add(start)
            cur = nxt.get(start)
            while cur is not None and cur != start and cur not in visited:
                loop.append(cur)
                visited.add(cur)
                cur = nxt.get(cur)
            if cur == start and len(loop) >= 3:
                for i in range(1, len(loop) - 1):
                    new_faces.append([loop[0], loop[i], loop[i + 1]])
        if new_faces:
            f2 = np.concatenate([m.faces, np.asarray(new_faces, np.int32)])
            m = isosurface.orient_consistently(TriMesh(m.vertices, f2))
    return m


def _subdivide_longest_edges(mesh: TriMesh, frac: float = 0.25) -> TriMesh:
    """1→3 split of the longest ``frac`` of faces (midpoint insertion at the
    longest edge) — the refinement primitive of the cage refinement loop."""
    v = mesh.vertices.astype(np.float64)
    f = mesh.faces
    e = v[f[:, [1, 2, 0]]] - v[f]  # edge vectors per face
    elen = np.linalg.norm(e, axis=-1)  # [F, 3]
    longest = elen.max(-1)
    k = max(1, int(len(f) * frac))
    split = np.argsort(-longest)[:k]
    split_set = set(split.tolist())
    new_v = list(v)
    new_f = []
    mid_cache = {}

    def midpoint(a, b):
        key = (min(a, b), max(a, b))
        if key not in mid_cache:
            mid_cache[key] = len(new_v)
            new_v.append((v[a] + v[b]) / 2)
        return mid_cache[key]

    for fi, (a, b, c) in enumerate(f):
        if fi not in split_set:
            new_f.append([a, b, c])
            continue
        le = int(np.argmax(elen[fi]))  # 0:(a,b) 1:(b,c) 2:(c,a)
        pairs = [(a, b, c), (b, c, a), (c, a, b)][le]
        p, q, r = pairs
        mm = midpoint(p, q)
        new_f += [[p, mm, r], [mm, q, r]]
    out = TriMesh(np.asarray(new_v, np.float32), np.asarray(new_f, np.int32))
    # splits at shared edges leave T-junctions on the neighbor face; weld +
    # repair resolves them conservatively
    return fix_proxy_mesh(out)


def refine_cage(
    cage: TriMesh,
    points: np.ndarray,
    iters: int = 2,
    margin: float = 0.0,
) -> TriMesh:
    """Cage refinement loop (the reference's optional refinement pass after
    proxy decimation, growing_selection.cu): alternately subdivide the
    coarsest faces and re-tighten containment, giving the cage more degrees
    of freedom where it is coarse."""
    for _ in range(max(0, iters)):
        cage = _subdivide_longest_edges(cage, frac=0.2)
        cage = inflate_to_bound(cage, points, margin=margin)
    return cage


def compute_proxy_cage(
    selection: np.ndarray,
    level: int,
    target_vertices: int = 100,
    dilation: int = 2,
    coarse_res: int = 32,
    refine_iters: int = 0,
) -> TriMesh:
    """Selection voxels → ~100-vertex bounding cage
    (compute_proxy_mesh growing_selection.cu:981-1049). ``refine_iters`` > 0
    additionally runs the subdivide+re-bound refinement loop."""
    from scipy import ndimage

    # dilate then downsample to a coarse field for a smooth outer shell
    sel = ndimage.binary_dilation(selection, iterations=dilation)
    f = sel.astype(np.float32)
    zoom = coarse_res / R
    coarse = ndimage.zoom(f, zoom, order=1)
    coarse = ndimage.gaussian_filter(coarse, 1.0)
    lo, hi = selection_to_world_box(level)
    spacing = (hi - lo) / coarse_res
    shell = isosurface.marching_tets(coarse, iso=0.3, origin=lo + spacing / 2, spacing=spacing)
    if shell.n_faces == 0:
        raise ValueError("empty selection: no cage")
    # keep the largest connected component (avoid floaters)
    shell = largest_component(shell)
    cage = vertex_cluster_decimate(shell, target_vertices)
    cage = largest_component(cage)
    # consistent outward winding is a hard requirement for MVC
    cage = isosurface.orient_consistently(cage)

    # selection voxel centers in world space
    xs, ys, zs = np.nonzero(selection)
    pts = np.stack([xs, ys, zs], -1).astype(np.float64)
    pts = lo + (pts + 0.5) * (hi - lo) / R
    if len(pts) > 20000:
        pts = pts[np.random.default_rng(0).choice(len(pts), 20000, replace=False)]
    cage = fix_proxy_mesh(cage)
    cage = inflate_to_bound(cage, pts, margin=float(spacing.min()) * 0.25)
    if refine_iters > 0:
        cage = refine_cage(cage, pts, iters=refine_iters, margin=float(spacing.min()) * 0.25)
    return cage


def box_cage(selection: np.ndarray, level: int, margin_cells: float = 2.0) -> TriMesh:
    """Axis-aligned cube fallback ('Box Cage', src/testbed.cu:1102-1155)."""
    xs, ys, zs = np.nonzero(selection)
    if len(xs) == 0:
        raise ValueError("empty selection")
    lo_w, hi_w = selection_to_world_box(level)
    cell = (hi_w - lo_w) / R
    pmin = lo_w + (np.array([xs.min(), ys.min(), zs.min()]) - margin_cells) * cell
    pmax = lo_w + (np.array([xs.max(), ys.max(), zs.max()]) + 1 + margin_cells) * cell
    return make_box_mesh(pmin, pmax)


def make_box_mesh(pmin, pmax) -> TriMesh:
    pmin = np.asarray(pmin, np.float32)
    pmax = np.asarray(pmax, np.float32)
    corners = np.array(
        [[pmin[0], pmin[1], pmin[2]], [pmax[0], pmin[1], pmin[2]],
         [pmin[0], pmax[1], pmin[2]], [pmax[0], pmax[1], pmin[2]],
         [pmin[0], pmin[1], pmax[2]], [pmax[0], pmin[1], pmax[2]],
         [pmin[0], pmax[1], pmax[2]], [pmax[0], pmax[1], pmax[2]]], np.float32
    )
    faces = np.array(
        [[0, 2, 1], [1, 2, 3], [4, 5, 6], [5, 7, 6], [0, 1, 4], [1, 5, 4],
         [2, 6, 3], [3, 6, 7], [0, 4, 2], [2, 4, 6], [1, 3, 5], [3, 7, 5]], np.int32
    )
    return TriMesh(corners, faces)


def largest_component(mesh: TriMesh) -> TriMesh:
    """Keep the largest face-connected component."""
    if mesh.n_faces == 0:
        return mesh
    parent = np.arange(mesh.n_vertices)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for f in mesh.faces:
        a, b, c = (find(x) for x in f)
        parent[b] = a
        parent[c] = a
    roots = np.array([find(v) for v in range(mesh.n_vertices)])
    face_root = roots[mesh.faces[:, 0]]
    vals, counts = np.unique(face_root, return_counts=True)
    big = vals[np.argmax(counts)]
    keep_f = face_root == big
    faces = mesh.faces[keep_f]
    used = np.unique(faces)
    remap = np.full(mesh.n_vertices, -1, np.int64)
    remap[used] = np.arange(len(used))
    return TriMesh(mesh.vertices[used], remap[faces].astype(np.int32))
