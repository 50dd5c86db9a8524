"""ctypes bindings for the C++ host kernels (cc/libd3net_host.so).

Builds the shared library on first import if the toolchain is available;
every entry point returns None-equivalents gracefully so
:mod:`d3net_tpu.ops.voxelize` can fall back to its numpy implementation.
The C++ kernels emit byte-identical outputs to the numpy path (same key
packing, same id ordering) — tests/test_native.py asserts this.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "cc")
_LIB_PATH = os.path.join(_CC_DIR, "libd3net_host.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CC_DIR], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _stale() -> bool:
    """True when any cc/ source is newer than the built library."""
    try:
        lib_mtime = os.path.getmtime(_LIB_PATH)
    except OSError:
        return True
    for name in os.listdir(_CC_DIR):
        if name.endswith((".cc", ".h")) or name == "Makefile":
            if os.path.getmtime(os.path.join(_CC_DIR, name)) > lib_mtime:
                return True
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # rebuild when sources changed so a stale binary never shadows cc/
    if (not os.path.exists(_LIB_PATH) or _stale()) and not _build():
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.d3_voxelize.restype = ctypes.c_int64
        lib.d3_voxelize.argtypes = [i32p, ctypes.c_int64, i32p, i32p]
        lib.d3_subm_table.restype = None
        lib.d3_subm_table.argtypes = [i32p, ctypes.c_int64, i32p]
        lib.d3_downsample.restype = ctypes.c_int64
        lib.d3_downsample.argtypes = [i32p, ctypes.c_int64, i32p, i32p]
        lib.d3_upsample.restype = None
        lib.d3_upsample.argtypes = [i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.d3_column_level.restype = ctypes.c_int64
        lib.d3_column_level.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p, i32p, u8p, i32p, i32p, i64p,
        ]
        lib.d3_column_pair.restype = None
        lib.d3_column_pair.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _c(coords: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(coords, dtype=np.int32)


def voxelize(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = get_lib()
    coords = _c(coords)
    n = len(coords)
    p2v = np.empty(n, np.int32)
    vc = np.empty((n, 3), np.int32)
    m = lib.d3_voxelize(_ptr(coords), n, _ptr(p2v), _ptr(vc))
    vc = vc[:m].copy()
    counts = np.bincount(p2v, minlength=m).astype(np.int32)
    return vc, p2v, counts


def submanifold_table(coords: np.ndarray) -> np.ndarray:
    lib = get_lib()
    coords = _c(coords)
    m = len(coords)
    nbr = np.empty((m, 27), np.int32)
    lib.d3_subm_table(_ptr(coords), m, _ptr(nbr))
    return nbr


def downsample_level(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    coords = _c(coords)
    m = len(coords)
    coarse = np.empty((max(m, 1), 3), np.int32)
    down = np.empty((max(m, 1), 8), np.int32)
    mc = lib.d3_downsample(_ptr(coords), m, _ptr(coarse), _ptr(down))
    return coarse[:mc].copy(), down[:mc].copy()


def upsample_table(fine: np.ndarray, coarse: np.ndarray) -> np.ndarray:
    lib = get_lib()
    fine, coarse = _c(fine), _c(coarse)
    up = np.empty((len(fine), 8), np.int32)
    lib.d3_upsample(_ptr(fine), len(fine), _ptr(coarse), len(coarse), _ptr(up))
    return up


def column_level(coords: np.ndarray, cap: int, ccap: int):
    """One C++ pass building every column table of one U-Net level.

    Returns (vox2col (cap,), col_nbr (ccap,9), col_zm, col_zp,
    col_occ (ccap,8) uint8, col2vox (ccap*8,), col_coords (nc,3),
    stats dict) — byte-identical to the numpy path in
    voxelize.build_column_maps (tests/test_native.py).
    """
    lib = get_lib()
    coords = _c(coords)
    m = len(coords)
    vox2col = np.full(cap, ccap * 8, np.int32)
    col_nbr = np.empty((ccap, 9), np.int32)
    col_zm = np.empty(ccap, np.int32)
    col_zp = np.empty(ccap, np.int32)
    col_occ = np.empty((ccap, 8), np.uint8)
    col2vox = np.empty(ccap * 8, np.int32)
    col_coords = np.empty((ccap, 3), np.int32)
    stats = np.zeros(4, np.int64)
    nc = lib.d3_column_level(
        _ptr(coords), m, ccap, _ptr(vox2col), _ptr(col_nbr), _ptr(col_zm),
        _ptr(col_zp), col_occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _ptr(col2vox), _ptr(col_coords),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return (vox2col, col_nbr, col_zm, col_zp, col_occ, col2vox,
            col_coords[:nc].copy(),
            dict(n_occ=int(stats[0]), phantoms=int(stats[1]),
                 dropped_phantoms=int(stats[2]),
                 overflow_voxels=int(stats[3])))


def column_pair(fine_cols: np.ndarray, fine_ccap: int,
                coarse_cols: np.ndarray, coarse_ccap: int):
    """Stride-2 child/parent/quad tables between column levels."""
    lib = get_lib()
    fine_cols, coarse_cols = _c(fine_cols), _c(coarse_cols)
    child = np.empty((coarse_ccap, 8), np.int32)
    parent = np.empty(fine_ccap, np.int32)
    quad = np.empty(fine_ccap, np.int32)
    lib.d3_column_pair(
        _ptr(fine_cols), len(fine_cols), fine_ccap,
        _ptr(coarse_cols), len(coarse_cols), coarse_ccap,
        _ptr(child), _ptr(parent), _ptr(quad),
    )
    return child, parent, quad
