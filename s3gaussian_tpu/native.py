"""ctypes bindings for the native data-plane library (native/s3g_native.cpp).

Falls back to the numpy implementations when the .so hasn't been built
(``make -C native``).  The native KNN is the host-side analog of the
reference's simple-knn CUDA extension.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "native", "libs3g_native.so")
    if not os.path.exists(path):
        # best-effort build (gcc is expected in the toolchain)
        import subprocess
        try:
            subprocess.run(["make", "-C", os.path.join(here, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.knn_mean_dist2.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                   ctypes.c_int, f32p, ctypes.c_int]
    lib.lidar_depth_map.argtypes = [f32p, ctypes.c_int64, f32p, f32p,
                                    ctypes.c_int, ctypes.c_int, f32p]
    lib.voxel_dedup.argtypes = [f32p, ctypes.c_int64, ctypes.c_float, i64p,
                                ctypes.c_int]
    lib.voxel_dedup.restype = ctypes.c_int64
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def knn_mean_dist2(points: np.ndarray, k: int = 3, window: int = 32,
                   n_threads: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.float32)
    nt = n_threads or min(os.cpu_count() or 1, 16)
    lib.knn_mean_dist2(_fp(pts), len(pts), k, window, _fp(out), nt)
    return out


def lidar_depth_map(points_world: np.ndarray, w2c: np.ndarray,
                    intrinsic: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points_world, np.float32)
    w2c34 = np.ascontiguousarray(np.asarray(w2c, np.float32)[:3, :4])
    k = np.ascontiguousarray(np.asarray(intrinsic, np.float32))
    depth = np.empty((h, w), np.float32)
    lib.lidar_depth_map(_fp(pts), len(pts), _fp(w2c34), _fp(k), h, w,
                        _fp(depth))
    return depth


def voxel_dedup(points: np.ndarray, voxel: float = 0.013,
                n_threads: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    keep = np.empty(len(pts), np.int64)
    nt = n_threads or min(os.cpu_count() or 1, 16)
    m = lib.voxel_dedup(_fp(pts), len(pts), voxel,
                        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                        nt)
    return keep[:m]
