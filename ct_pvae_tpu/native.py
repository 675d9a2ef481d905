"""ctypes bindings to the native C++ library (native/ctnative.cpp).

Plays the role tomopy's C kernels and xdesign's rasterizer play for the
reference (SURVEY.md §2.3): an independent CPU oracle for the projector pair
and a fast foam rasterizer.  The library is built on demand with g++; all
callers must handle ``available() == False`` gracefully (e.g. CI without a
toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_DIR, "libctnative.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    c_int = ctypes.c_int
    lib.radon_oracle.argtypes = [f32p, c_int, c_int, c_int, f64p, c_int, c_int, ctypes.c_float, f32p]
    lib.radon_oracle.restype = None
    lib.backproject_oracle.argtypes = [f32p, c_int, c_int, c_int, f64p, c_int, c_int, f32p]
    lib.backproject_oracle.restype = None
    lib.foam_rasterize.argtypes = [f64p, f64p, c_int, c_int, c_int, f32p]
    lib.foam_rasterize.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def radon_oracle(images: np.ndarray, theta: np.ndarray, n_det: int, step: float = 0.25) -> np.ndarray:
    """Fine-step ray-marching Radon transform (oracle-grade, CPU).

    images: (N, H, W) -> (N, A, n_det)
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no toolchain?)")
    images = np.ascontiguousarray(images, np.float32)
    theta = np.ascontiguousarray(theta, np.float64)
    n, h, w = images.shape
    out = np.zeros((n, len(theta), n_det), np.float32)
    lib.radon_oracle(images, n, h, w, theta, len(theta), n_det, np.float32(step), out)
    return out


def backproject_oracle(sino: np.ndarray, theta: np.ndarray, x_size: int, y_size: int) -> np.ndarray:
    """Pixel-driven backprojection: (N, A, P) -> (N, x_size, y_size)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no toolchain?)")
    sino = np.ascontiguousarray(sino, np.float32)
    theta = np.ascontiguousarray(theta, np.float64)
    n, a, p = sino.shape
    out = np.zeros((n, x_size, y_size), np.float32)
    lib.backproject_oracle(sino, n, a, p, theta, x_size, y_size, out)
    return out


def foam_rasterize(centers: np.ndarray, radii: np.ndarray, n_pixel: int, supersample: int = 2) -> np.ndarray:
    """Rasterize one foam phantom from packed void circles."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no toolchain?)")
    centers = np.ascontiguousarray(centers.reshape(-1, 2), np.float64)
    radii = np.ascontiguousarray(radii, np.float64)
    out = np.zeros((n_pixel, n_pixel), np.float32)
    lib.foam_rasterize(centers, radii, len(radii), n_pixel, supersample, out)
    return out
