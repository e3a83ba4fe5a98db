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


def test_voxelize_matches_python_path(lib):
    """The live native voxelizer (plane-refined, multithreaded, sorted
    per-cell) is EXACTLY equivalent to the python fallback — same cells,
    same candidate lists, same fanout."""
    from nerfshop_tpu.editing.cage import Cage
    from nerfshop_tpu.editing.tet_mesh import TetMesh
    from test_bvh import cube_mesh

    cage = Cage.from_mesh(cube_mesh(0.3, 0.7))
    tm = TetMesh.from_cage(cage, ideal_edge=0.1)
    res, max_t = 16, 64

    lo_n, ic_n, cells_n, seen_n = tm._voxelize(tm.vertices_original, res, max_t, use_native=True)
    lo_p, ic_p, cells_p, seen_p = tm._voxelize(tm.vertices_original, res, max_t, use_native=False)

    np.testing.assert_array_equal(lo_n, lo_p)
    np.testing.assert_array_equal(ic_n, ic_p)
    assert seen_n == seen_p
    assert cells_n.shape == cells_p.shape
    np.testing.assert_array_equal(cells_n, cells_p)


def test_voxelize_drag_latency(lib):
    """A realistic ~100-vertex cage rebuilds its LUTs fast enough for
    per-gizmo-drag use (SURVEY hard-part #4 budget: <50 ms on a real host;
    generous CI bound since the suite shares one core)."""
    import time

    from nerfshop_tpu.editing.cage import Cage
    from nerfshop_tpu.editing.tet_mesh import TetMesh
    from test_bvh import cube_mesh

    cage = Cage.from_mesh(cube_mesh(0.25, 0.75))
    tm = TetMesh.from_cage(cage, ideal_edge=0.06)
    assert len(tm.tets) > 500  # realistic drag-scale workload
    tm._voxelize(tm.vertices_original, 64, 32)  # warm (thread pool, pages)
    t0 = time.perf_counter()
    tm._voxelize(tm.vertices_original, 64, 32)
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"native voxelize took {dt*1e3:.0f} ms"


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
