"""Native C++ host kernels vs their numpy fallbacks."""

import numpy as np
import pytest

from nerfshop_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native lib unavailable (g++ build failed)")
    return l


def test_voxelize_matches_numpy(lib):
    from nerfshop_tpu.editing.cage import Cage
    from nerfshop_tpu.editing.tet_mesh import TetMesh
    from test_bvh import cube_mesh

    cage = Cage.from_mesh(cube_mesh(0.3, 0.7))
    tm = TetMesh.from_cage(cage, ideal_edge=0.1)
    res, max_t = 16, 32

    tv = tm.vertices_original[tm.tets]
    lo = tv.min((0, 1)) - 1e-4
    hi = tv.max((0, 1)) + 1e-4
    inv_cell = res / np.maximum(hi - lo, 1e-9)

    cells_nat, max_nat = native.voxelize_tets(tm.vertices_original, tm.tets, res, lo, inv_cell, max_t)

    # numpy reference (same loop as the fallback)
    cell_lists = [[] for _ in range(res**3)]
    # mirror the 1-cell padding (near-miss candidate dilation)
    t_lo = np.clip(((tv.min(1) - lo) * inv_cell).astype(int) - 1, 0, res - 1)
    t_hi = np.clip(((tv.max(1) - lo) * inv_cell).astype(int) + 1, 0, res - 1)
    for ti in range(len(tm.tets)):
        for x in range(t_lo[ti][0], t_hi[ti][0] + 1):
            for y in range(t_lo[ti][1], t_hi[ti][1] + 1):
                for z in range(t_lo[ti][2], t_hi[ti][2] + 1):
                    cell_lists[(x * res + y) * res + z].append(ti)

    for ci in range(res**3):
        got = set(cells_nat[ci][cells_nat[ci] >= 0].tolist())
        expect = set(cell_lists[ci][:max_t])
        if len(cell_lists[ci]) <= max_t:
            assert got == expect, ci


def test_region_grow_native(lib):
    res = 128
    dens = np.zeros((res, res, res), np.float32)
    dens[40:60, 40:60, 40:60] = 1.0  # a dense block
    sel = np.zeros((res, res, res), np.uint8)
    seeds = np.asarray([(50 * res + 50) * res + 50], np.int32)
    grown = native.region_grow(dens, sel, seeds, 0.5, 10**7)
    assert grown == 20**3
    assert sel.sum() == 20**3
    assert sel[41, 45, 55] and not sel[20, 20, 20]


def test_clear_cells_in_tets(lib):
    verts = np.asarray([[0.4, 0.4, 0.4], [0.6, 0.4, 0.4], [0.4, 0.6, 0.4], [0.4, 0.4, 0.6]], np.float32)
    tets = np.asarray([[0, 1, 2, 3]], np.int32)
    density = np.ones((128, 128, 128), np.float32)
    native.clear_cells_in_tets(verts, tets, 128, 0.0, 1.0 / 128, density)
    assert density[64, 57, 57] == 0.0  # inside the tet bbox
    assert density[5, 5, 5] == 1.0


def test_region_growing_class_uses_native(lib):
    from nerfshop_tpu.editing.selection import RegionGrowing

    dens = np.zeros((1, 128, 128, 128), np.float32)
    dens[0, 60:70, 60:70, 60:70] = 1.0
    rg = RegionGrowing(density=dens, density_threshold=0.5)
    rg.reset(np.asarray([[0, 64, 64, 64]]))
    grown = rg.grow(10**7)
    assert grown == 1000
