"""Differentiable filtered back-projection (FBP).

The reference defines a TF ``iradon`` (fbp_tensorflow.py:14-75) — 1-D Fourier
ramp filtering followed by per-angle interpolation — but leaves it unwired,
using tomopy's C ``gridrec``/``fbp`` kernels for the encoder-input recons
(helper_functions.py:503-516).  Here FBP is a first-class XLA op: rFFT filter
multiply on the detector axis + the vectorized pixel-driven backprojector from
ops/radon.py.  It serves as the 'gridrec'/'fbp' classical-init algorithms and
as a building block for eval baselines.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .radon import backproject

Array = jnp.ndarray

FILTERS = ("ramp", "ramlak", "shepp", "shepp-logan", "cosine", "hamming", "hann", "none")


def fourier_filter(size: int, filter_name: str = "ramp") -> np.ndarray:
    """Frequency-domain FBP filter of length ``size`` (full FFT layout).

    Construction follows Kak & Slaney's band-limited ramp (the same recipe as
    skimage's ``_get_fourier_filter``, which the reference imports at
    main_ct_vae.py:22): the spatial-domain ramp response is laid out explicitly
    and FFT'd, avoiding the DC-bias of a naive |f| ramp.
    """
    if filter_name not in FILTERS:
        raise ValueError(f"unknown filter {filter_name!r}; options: {FILTERS}")
    # Band-limited ramp kernel h[0]=1/4, h[+-m]=-1/(pi m)^2 for odd m
    # (Kak & Slaney eq. 61), laid out circularly, symmetric in both halves.
    f = np.zeros(size)
    f[0] = 0.25
    m_pos = np.arange(1, size // 2 + 1)
    odd_pos = m_pos[m_pos % 2 == 1]
    f[odd_pos] = -1.0 / (np.pi * odd_pos) ** 2
    m_neg = np.arange(1, (size + 1) // 2)
    odd_neg = m_neg[m_neg % 2 == 1]
    f[size - odd_neg] = -1.0 / (np.pi * odd_neg) ** 2
    omega = 2.0 * np.real(np.fft.fft(f))  # ~ 2|fftfreq|: ramp, 1 at Nyquist

    if filter_name in ("ramp", "ramlak"):
        pass
    elif filter_name in ("shepp", "shepp-logan"):
        w = np.pi * np.fft.fftfreq(size)[1:]
        omega[1:] *= np.sin(w) / w
    elif filter_name == "cosine":
        freq = np.linspace(0, np.pi, size, endpoint=False)
        omega *= np.fft.fftshift(np.sin(freq))
    elif filter_name == "hamming":
        omega *= np.fft.fftshift(np.hamming(size))
    elif filter_name == "hann":
        omega *= np.fft.fftshift(np.hanning(size))
    elif filter_name == "none":
        omega = np.ones(size)
    return omega


def filter_sinogram(sinogram: Array, filter_name: str = "ramp") -> Array:
    """Apply the FBP frequency filter along the detector axis via rFFT."""
    p = sinogram.shape[-1]
    omega = fourier_filter(p, filter_name)
    omega_r = jnp.asarray(omega[: p // 2 + 1], dtype=jnp.float32)  # rfft layout
    spec = jnp.fft.rfft(sinogram, axis=-1)
    return jnp.fft.irfft(spec * omega_r, n=p, axis=-1).astype(sinogram.dtype)


def fbp(
    sinogram: Array,
    theta: Array,
    x_size: int,
    y_size: int,
    filter_name: str = "ramp",
) -> Array:
    """Filtered back-projection reconstruction.

    Args:
      sinogram: (..., A, P)
      theta: (A,) radians
      x_size, y_size: output crop (the region tomopy would reconstruct then
        crop to, helper_functions.py:506).
      filter_name: one of FILTERS; 'none' gives unfiltered backprojection
        (used for the mask channel, helper_functions.py:514-516).

    Returns: (..., x_size, y_size)
    """
    a = sinogram.shape[-2]
    filtered = filter_sinogram(sinogram, filter_name)
    recon = backproject(filtered, theta, x_size, y_size)
    # Classical FBP normalization (reference fbp_tensorflow.py:74).
    return recon * (math.pi / (2.0 * a))
