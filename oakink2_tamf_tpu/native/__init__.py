"""Native (C++) components, built on demand with the in-tree Makefile and bound
via ctypes (no pybind11 in this image)."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_logger = logging.getLogger(__name__)

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_THIS_DIR, "libtamf_native.so")
_lib = None
_build_failed = False


def _get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_THIS_DIR, check=True, capture_output=True
            )
        except Exception as e:  # no toolchain: fall back to numpy paths
            _logger.warning("native build failed (%s); using numpy fallback", e)
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.inside_mesh_query.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.inside_mesh_query.restype = None
        _lib = lib
    except OSError as e:
        _logger.warning("native load failed (%s); using numpy fallback", e)
        _build_failed = True
    return _lib


def inside_mesh_native(verts: np.ndarray, faces: np.ndarray, points: np.ndarray,
                       resolution: int = 512) -> np.ndarray | None:
    """C++ spatial-hash ray-parity inside test. Returns bool [n_points] or None
    when the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    p = np.ascontiguousarray(points, dtype=np.float64)
    out = np.zeros(p.shape[0], dtype=np.uint8)
    lib.inside_mesh_query(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), f.shape[0],
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), p.shape[0],
        int(resolution), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)
