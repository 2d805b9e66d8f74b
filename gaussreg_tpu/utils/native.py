"""ctypes bindings for the native host-side library (native/gaussreg_native.cpp).

The device compute path never touches this; it accelerates host data loading
(FPS downsampling of raw GS clouds before padding/transfer), replacing the
reference's Rust `fpsample` dependency
(reference: datasets/.../dataset.py:127).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libgaussreg_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        src = os.path.join(os.path.dirname(path), "gaussreg_native.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["sh", os.path.join(os.path.dirname(path), "build.sh")],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.gaussreg_bucket_fps.restype = ctypes.c_int
    lib.gaussreg_bucket_fps.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.gaussreg_fps.restype = ctypes.c_int
    lib.gaussreg_fps.argtypes = lib.gaussreg_bucket_fps.argtypes
    lib.gaussreg_grid_subsample.restype = ctypes.c_int64
    lib.gaussreg_grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def furthest_point_sample(
    points: np.ndarray, num_samples: int, seed: int = 0, exact: bool = False
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty(num_samples, dtype=np.int64)
    fn = lib.gaussreg_fps if exact else lib.gaussreg_bucket_fps
    rc = fn(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0],
        num_samples,
        seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"native FPS failed: rc={rc}")
    return out


def grid_subsample_host(points: np.ndarray, voxel: float, capacity: int):
    lib = _load()
    assert lib is not None, "native library unavailable"
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.zeros((capacity, 3), dtype=np.float32)
    total = lib.gaussreg_grid_subsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0],
        voxel,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity,
    )
    return out[: min(total, capacity)], int(total)
