"""Image quality metrics: MSE / SSIM / PSNR.

The reference calls skimage.metrics (helper_functions.py:394-418).  skimage is
not a dependency here; these are numerically compatible implementations:

  * ``ssim`` follows Wang et al. 2004 with skimage's defaults: uniform 7x7
    window (win_size auto-shrunk to the largest odd size for tiny images,
    matching helper_functions.py:399-406), K1=0.01, K2=0.03, sample covariance
    normalization N/(N-1), mean over the valid (border-cropped) region.
  * ``compare(recon0, recon1)`` reproduces the reference's call pattern:
    data_range taken from the FIRST image's min/max.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.ndimage import uniform_filter


def mse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2))


def psnr(a: np.ndarray, b: np.ndarray, data_range: float) -> float:
    err = mse(a, b)
    if err == 0:
        return float("inf")
    return float(10.0 * np.log10((data_range**2) / err))


def _auto_win_size(shape) -> int:
    small = min(shape)
    if small < 7:
        return small if small % 2 else small - 1
    return 7


def ssim(a: np.ndarray, b: np.ndarray, data_range: float, win_size: int = None) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if win_size is None:
        win_size = _auto_win_size(a.shape)
    if win_size < 1:
        raise ValueError("win_size must be >= 1")
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    np_win = win_size ** a.ndim
    cov_norm = np_win / (np_win - 1) if np_win > 1 else 1.0

    filt = lambda x: uniform_filter(x, size=win_size)
    ux = filt(a)
    uy = filt(b)
    uxx = filt(a * a)
    uyy = filt(b * b)
    uxy = filt(a * b)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    if pad:
        s = s[tuple(slice(pad, dim - pad) for dim in s.shape)]
    return float(s.mean())


def compare(recon0: np.ndarray, recon1: np.ndarray, verbose: bool = False) -> Tuple[float, float, float]:
    """(MSE, SSIM, PSNR) with the reference's conventions
    (helper_functions.py:394-418): data_range = recon0.max()-recon0.min()."""
    recon0 = np.asarray(recon0)
    recon1 = np.asarray(recon1)
    data_range = float(recon0.max() - recon0.min())
    m = mse(recon0, recon1)
    s = ssim(recon0, recon1, data_range)
    p = psnr(recon0, recon1, data_range)
    if verbose:
        print(f"MSE: {m:.8f}, SSIM: {s:.3f}, PSNR: {p:.3f}")
    return m, s, p
