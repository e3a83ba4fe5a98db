"""Native host-runtime kernels (C++/std::thread) with automatic build and
transparent numpy fallback. See host_ops.cpp for what lives here and why."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libhost_ops.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _DIR / "host_ops.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(src), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = _DIR / "host_ops.cpp"
        stale = (
            not _LIB_PATH.exists()
            or _LIB_PATH.stat().st_mtime < src.stat().st_mtime
        )
        if stale and not _build() and not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.voxelize_tets.restype = ctypes.c_int
        lib.voxelize_tets.argtypes = [
            f32p, i32p, ctypes.c_int64, ctypes.c_int, f32p, f32p, ctypes.c_int, i32p,
        ]
        lib.region_grow.restype = ctypes.c_int64
        lib.region_grow.argtypes = [
            f32p, u8p, ctypes.c_int, i32p, ctypes.c_int64, ctypes.c_float, ctypes.c_int64,
        ]
        lib.clear_cells_in_tets.restype = None
        lib.clear_cells_in_tets.argtypes = [
            f32p, i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_float, ctypes.c_float, f32p,
        ]
        _lib = lib
        return _lib


def voxelize_tets(verts: np.ndarray, tets: np.ndarray, res: int, bbox_lo: np.ndarray, inv_cell: np.ndarray, max_t: int):
    """→ (cells [res³, max_t] int32 (-1 padded), max_fanout_seen) or None if
    the native lib is unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    cells = np.full((res**3, max_t), -1, np.int32)
    max_seen = lib.voxelize_tets(
        np.ascontiguousarray(verts, np.float32),
        np.ascontiguousarray(tets, np.int32),
        len(tets), res,
        np.ascontiguousarray(bbox_lo, np.float32),
        np.ascontiguousarray(inv_cell, np.float32),
        max_t, cells,
    )
    return cells, int(max_seen)


def region_grow(density: np.ndarray, selection: np.ndarray, seeds: np.ndarray, threshold: float, max_steps: int):
    """In-place BFS on selection (uint8 [res³] view); → grown count or None."""
    lib = get_lib()
    if lib is None:
        return None
    res = density.shape[0]
    return int(
        lib.region_grow(
            np.ascontiguousarray(density, np.float32).reshape(-1),
            selection.reshape(-1),
            res,
            np.ascontiguousarray(seeds, np.int32),
            len(seeds),
            float(threshold),
            int(max_steps),
        )
    )


def clear_cells_in_tets(verts: np.ndarray, tets: np.ndarray, res: int, world_lo: float, cell_w: float, density: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    lib.clear_cells_in_tets(
        np.ascontiguousarray(verts, np.float32),
        np.ascontiguousarray(tets, np.int32),
        len(tets), res, float(world_lo), float(cell_w),
        density.reshape(-1),
    )
    return True
