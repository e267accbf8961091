"""ctypes bindings for the native IO codec (ply_native.cc).

Builds lazily with g++ on first use (cached as libgsattack_native.so next
to the source); every entry point has a numpy fallback so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ply_native.cc")
_LIB = os.path.join(_DIR, "libgsattack_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without openmp/march (portability)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.gsattack_ply_read_columns.restype = ctypes.c_int
            lib.gsattack_ply_read_columns.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ]
            lib.gsattack_ply_interleave.restype = ctypes.c_int
            lib.gsattack_ply_interleave.argtypes = [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_columns(path: str, data_offset: int, n_rows: int, n_cols: int):
    """Row-major f32 table on disk -> (n_cols, n_rows) array, natively if
    possible. Returns None when the native path is unavailable/fails."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((n_cols, n_rows), np.float32)
    rc = lib.gsattack_ply_read_columns(
        path.encode(), data_offset, n_rows, n_cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def interleave(columns: list[np.ndarray]) -> Optional[np.ndarray]:
    """Column f32 arrays -> row-major (n_rows, n_cols) buffer natively."""
    lib = get_lib()
    if lib is None:
        return None
    n_cols = len(columns)
    n_rows = columns[0].shape[0]
    cols = [np.ascontiguousarray(c, np.float32) for c in columns]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n_cols)(
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for c in cols]
    )
    out = np.empty((n_rows, n_cols), np.float32)
    rc = lib.gsattack_ply_interleave(
        ptrs, n_rows, n_cols, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out if rc == 0 else None
