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

import jax
import jax.numpy as jnp
import numpy as np

from .radon import backproject

Array = jnp.ndarray


def _backproject_any(filtered: Array, theta, x_size: int, y_size: int) -> Array:
    """Route the backprojection by geometry.

    The pixel-driven gather backprojector is the reference-semantics path
    (every committed 184-detector run was scored with it), but its gather
    index buffers pad 64x on TPU lanes and exhaust HBM at stretch scale
    (728-pixel detector, 360 angles).  Big square geometries on TPU route to
    the Pallas MXU adjoint kernel instead (the exact transpose of the Joseph
    forward — proven at 512^2-class shapes, BENCH.md), which differs from
    the pixel-driven path only in interpolation discretization.
    """
    p = filtered.shape[-1]
    if p >= 512 and x_size == y_size and jax.default_backend() == "tpu":
        try:
            theta_t = tuple(float(t) for t in np.asarray(theta))
        except Exception:
            theta_t = None  # traced angles: stay on the gather path
        if theta_t is not None:
            from .pallas_radon import backproject_pallas

            flat = filtered.reshape((-1,) + filtered.shape[-2:])
            out = backproject_pallas(flat, theta_t, x_size, y_size)
            return out.reshape(filtered.shape[:-2] + (x_size, y_size))
    return backproject(filtered, theta, x_size, y_size)

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


def voronoi_angle_weights(theta: Array) -> Array:
    """Per-angle angular-density weights for nonuniform view sets.

    The FBP integral f(x) = \\int_0^pi q_theta(x . n) dtheta is discretized
    as sum_i w_i q_i with w_i the Voronoi cell length of angle i on the
    half-circle [0, pi) (wrapping: projections are pi-periodic up to detector
    flip, and the datasets here draw angles from [0, pi)).  For a uniform
    grid this reduces exactly to w_i = pi/A, i.e. classical FBP; for a random
    sparse subset (the reference's ``--random`` masks) it compensates local
    angle clustering the way tomopy's gridrec density-compensates its polar
    Fourier samples — uniform pi/A weights over clustered angles double-count
    some orientations and under-weight gaps, biasing amplitude and costing
    several dB on the partial-sinogram baseline.

    Assumes ``theta`` is in RADIANS with span ``max - min < pi`` (every
    dataset in this repo draws angles from [0, pi)).  A wider span (or
    degrees) would make the wrap gap at the pi seam negative; gaps are
    clamped to >= 0 so the weights stay non-negative, but densities across
    a >pi span are not meaningful — re-map such angles into [0, pi) first.
    """
    a = theta.shape[-1]
    order = jnp.argsort(theta, axis=-1)
    ts = jnp.take_along_axis(theta, order, axis=-1)
    gaps = jnp.diff(ts, axis=-1)
    wrap = (ts[..., :1] + math.pi) - ts[..., -1:]     # gap across the pi seam
    g = jnp.concatenate([gaps, wrap], axis=-1)        # g[i] = ts[i+1]-ts[i]
    g = jnp.maximum(g, 0.0)                           # guard span >= pi inputs
    g_prev = jnp.roll(g, 1, axis=-1)
    w_sorted = 0.5 * (g + g_prev)                     # Voronoi cell of ts[i]
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(w_sorted, inv, axis=-1).astype(theta.dtype)


def fbp(
    sinogram: Array,
    theta: Array,
    x_size: int,
    y_size: int,
    filter_name: str = "ramp",
    angle_weights: str = "uniform",
) -> Array:
    """Filtered back-projection reconstruction.

    Args:
      sinogram: (..., A, P)
      theta: (A,) radians
      x_size, y_size: output crop (the region tomopy would reconstruct then
        crop to, helper_functions.py:506).
      filter_name: one of FILTERS; 'none' gives unfiltered backprojection
        (used for the mask channel, helper_functions.py:514-516).
      angle_weights: 'uniform' — classical pi/(2A) normalization (reference
        fbp_tensorflow.py:74); 'voronoi' — per-angle density compensation
        (see ``voronoi_angle_weights``), bit-identical to 'uniform' on a
        uniform angle grid.

    Returns: (..., x_size, y_size)
    """
    a = sinogram.shape[-2]
    filtered = filter_sinogram(sinogram, filter_name)
    if angle_weights == "voronoi":
        w = voronoi_angle_weights(jnp.asarray(theta))
        recon = _backproject_any(filtered * w[..., :, None], theta, x_size, y_size)
        return recon * 0.5
    if angle_weights != "uniform":
        raise ValueError(f"unknown angle_weights {angle_weights!r}")
    recon = _backproject_any(filtered, theta, x_size, y_size)
    # Classical FBP normalization (reference fbp_tensorflow.py:74).
    return recon * (math.pi / (2.0 * a))
