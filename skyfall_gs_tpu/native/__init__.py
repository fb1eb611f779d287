"""Native (C++) host components with ctypes bindings.

The reference backs its host-adjacent hot spots with CUDA/C++ extensions
(simple-knn, fused-ssim, the rasterizer).  On TPU the compute path is
Pallas/XLA; the host-side pieces that remain (scene-load KNN, IO) get C++
implementations here, built on demand with g++ (pybind11 is not available in
this image, so the bindings are plain C ABI + ctypes).

Build: ``python -m skyfall_gs_tpu.native.build`` (or automatically on first
use).  Every entry point has a pure-Python fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libskyfall_native.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build(verbose: bool = False) -> str:
    """Compile the native library with g++."""
    srcs = [os.path.join(_SRC_DIR, f) for f in sorted(os.listdir(_SRC_DIR))
            if f.endswith(".cc")]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-o", _LIB_PATH] + srcs
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            build()
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mean_sq_dist_3nn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.mean_sq_dist_3nn.restype = None
        _lib = lib
    except OSError:
        _build_failed = True
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def mean_sq_dist_3nn(points: np.ndarray, threads: int = 0) -> np.ndarray:
    """Native grid-hashed 3-NN mean squared distance; raises if unbuilt."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed)")
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    out = np.empty(n, np.float32)
    lib.mean_sq_dist_3nn(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(threads),
    )
    return out
