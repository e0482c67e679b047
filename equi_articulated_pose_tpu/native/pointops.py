"""ctypes bindings for the native data-engine kernels (libpointops.so).

Auto-builds the shared library with make on first import (g++ is baked into
the image); every entry point has a pure-numpy fallback so the package works
without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpointops.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_f64p = ctypes.POINTER(ctypes.c_double)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        lib.eap_fps.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_int64,
                                ctypes.c_int32, ctypes.c_int32, c_i32p]
        lib.eap_fps_batch.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, c_i32p]
        lib.eap_sample_mesh.argtypes = [c_f64p, c_i64p, c_i64p, c_i64p,
                                        ctypes.c_int64, ctypes.c_uint64,
                                        c_f64p, c_i64p]
        lib.eap_ball_query.argtypes = [c_f32p, c_f32p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_float,
                                       ctypes.c_int64, c_i32p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def fps(points: np.ndarray, m: int, start: int = 0) -> np.ndarray:
    """Greedy FPS.  points [N, 3] -> idx [m] int64 (native when available)."""
    n = points.shape[0]
    if m >= n:
        return np.arange(n, dtype=np.int64)
    lib = _load()
    if lib is None:
        from ..data.mesh import _fps_numpy_impl

        return _fps_numpy_impl(points, m, start)
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty(m, dtype=np.int32)
    lib.eap_fps(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        m,
        start,
        0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out.astype(np.int64)


def sample_mesh(
    vertices: np.ndarray,
    triangles: np.ndarray,
    tri_seg: np.ndarray,
    counts: np.ndarray,
    seed: int,
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    total = int(counts.sum())
    if lib is None:
        raise RuntimeError("native library unavailable")
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    t = np.ascontiguousarray(triangles, dtype=np.int64)
    s = np.ascontiguousarray(tri_seg, dtype=np.int64)
    c = np.ascontiguousarray(counts, dtype=np.int64)
    out_pts = np.empty((total, 3), dtype=np.float64)
    out_seg = np.empty(total, dtype=np.int64)
    lib.eap_sample_mesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(t),
        seed & 0xFFFFFFFFFFFFFFFF,
        out_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out_pts, out_seg


def ball_query(query: np.ndarray, support: np.ndarray, radius: float, k: int):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    q = np.ascontiguousarray(query, dtype=np.float32)
    s = np.ascontiguousarray(support, dtype=np.float32)
    out = np.empty((len(q), k), dtype=np.int32)
    lib.eap_ball_query(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(q),
        len(s),
        radius,
        k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
