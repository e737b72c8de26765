"""Native host-runtime kernels (C, ctypes-bound) with numpy fallbacks.

Compiled lazily on first use into a per-version cache; if no C compiler is
available the callers fall back to the pure-numpy implementations. This is
the (small) native runtime layer of the framework — the analogue of the
mesh/dof machinery the reference gets from dolfin's C++ core.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "fastmesh.c"
_LIB = None
_TRIED = False


def _build_dir() -> Path:
    tag = hashlib.md5(_SRC.read_bytes()).hexdigest()[:10]
    d = Path(tempfile.gettempdir()) / f"flowcontrol_tpu_native_{tag}"
    d.mkdir(exist_ok=True)
    return d


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _build_dir() / "_fastmesh.so"
    try:
        if not so.exists():
            cc = os.environ.get("CC", "cc")
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(so), "-lm"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.locate_points.restype = ctypes.c_int64
        lib.locate_points.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,  # coords, nv
            ctypes.c_void_p, ctypes.c_int64,  # cells, nc
            ctypes.c_void_p, ctypes.c_int64,  # pts, np
            ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p,  # out_cell, out_bary
        ]
        lib.gather_table_kmax.restype = ctypes.c_int64
        lib.gather_table_kmax.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64
        ]
        lib.gather_table_fill.restype = ctypes.c_int64
        lib.gather_table_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        _LIB = lib
        logger.info("fastmesh native kernels loaded")
    except Exception as e:  # no compiler / build failure → numpy fallback
        logger.info(f"fastmesh native build unavailable ({e!r}); numpy fallback")
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def locate_points(coords: np.ndarray, cells: np.ndarray, pts: np.ndarray,
                  tol: float = 1e-8):
    """Uniform-grid point location. Returns (cell_idx (np,), bary (np,3)).

    Native O(log)-ish per query; raises ValueError on unlocated points.
    """
    lib = _load()
    if lib is None:
        return None  # caller falls back
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    pts = np.ascontiguousarray(np.atleast_2d(pts), dtype=np.float64)
    out_cell = np.empty(len(pts), dtype=np.int32)
    out_bary = np.empty((len(pts), 3), dtype=np.float64)
    found = lib.locate_points(
        coords.ctypes.data, len(coords), cells.ctypes.data, len(cells),
        pts.ctypes.data, len(pts), tol,
        out_cell.ctypes.data, out_bary.ctypes.data,
    )
    if found < len(pts):
        missing = pts[out_cell < 0]
        raise ValueError(f"points outside the mesh: {missing[:3]}...")
    return out_cell, out_bary


def build_gather_table(dofs_flat: np.ndarray, n_dofs: int):
    """Native single-pass gather-table build; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    dofs_flat = np.ascontiguousarray(
        np.asarray(dofs_flat).reshape(-1), dtype=np.int32
    )
    m = len(dofs_flat)
    kmax = lib.gather_table_kmax(dofs_flat.ctypes.data, m, n_dofs)
    if kmax < 0:
        return None
    table = np.empty((n_dofs, int(kmax)), dtype=np.int32)
    rc = lib.gather_table_fill(
        dofs_flat.ctypes.data, m, n_dofs, int(kmax), table.ctypes.data
    )
    if rc != 0:
        return None
    return table
