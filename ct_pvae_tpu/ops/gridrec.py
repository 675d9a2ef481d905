"""Fourier-regridding reconstruction (the gridrec algorithm class).

The reference's classical reconstructions call tomopy's C ``gridrec`` kernel
(helper_functions.py:503-516, bin/final_merit.py:60,84).  Round 1 stood in a
ramp-FBP for it; this module implements the actual algorithm family —
central-slice-theorem inversion by convolutional gridding — as a pure-XLA op
(FFTs + vectorized scatter-add), jittable and vmappable on TPU:

  1. 1-D DFT of each (zero-padded, center-referenced) projection gives polar
     samples of the object's 2-D spectrum (central slice theorem).
  2. Each polar sample, weighted by the band-limited ramp (the polar Jacobian
     |omega| d_omega d_theta with Voronoi angular cells — exact for uniform
     grids, density-compensating for the ``--random`` sparse-angle masks) is
     spread onto a 2x-oversampled Cartesian lattice with a separable
     Kaiser-Bessel kernel.
  3. Inverse 2-D FFT with a half-pixel-center phase ramp, then division by
     the kernel's analytic transform (deapodization) and crop.

All constants are derived, none calibrated: tests check agreement with the
pixel-driven FBP (ops/fbp.py) on dense uniform angles, where both discretize
the same integral.

Accepted band-edge error: kernel taps are wrapped onto the lattice with
``jnp.mod(idx, m)``, so taps of polar samples at exactly lattice Nyquist
(|g| == m/2, the outermost detector frequencies) alias onto the conjugate
band edge.  On a periodic DFT lattice this wrap is identical to the
pad-by-kernel_width-and-fold formulation of classical gridding; the residual
aliasing is confined to the highest |omega| ring, is attenuated by the KB
apodization, and sits below the ramp-filter discretization error measured in
tests/test_eval.py's FBP-agreement check.  Eliminating it entirely would
require enlarging the IFFT lattice beyond ``oversample * pg`` so polar
Nyquist samples fall strictly inside the band — not worth the extra FFT cost
at the accuracy level validated here.

Geometry matches ops/radon.py's backprojector: image axes (x, y), projection
coordinate t = y cos(theta) - x sin(theta) + (P-1)/2, so a projection at
angle theta samples the spectrum along the unit vector (-sin theta, cos theta).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fbp import fourier_filter, voronoi_angle_weights

Array = jnp.ndarray


def _kb_beta(width: int, osf: int) -> float:
    """Beatty et al. (2005) optimal Kaiser-Bessel shape for this grid."""
    return math.pi * math.sqrt(
        (width / osf) ** 2 * (osf - 0.5) ** 2 - 0.8
    )


def _kb_kernel(s: Array, width: int, beta: float) -> Array:
    """Separable Kaiser-Bessel gridding kernel, half-width ``width/2`` lattice
    cells, evaluated at (fractional) lattice offsets ``s``."""
    half = width / 2.0
    x = 1.0 - (s / half) ** 2
    val = jnp.i0(beta * jnp.sqrt(jnp.maximum(x, 0.0)))
    return jnp.where(x >= 0.0, val / jnp.i0(jnp.asarray(beta)), 0.0)


def _kb_apodization(x: np.ndarray, width: int, beta: float, m: int) -> np.ndarray:
    """Analytic Fourier transform of the KB kernel at image offsets ``x``
    (pixels) for an ``m``-point lattice: the deapodization divisor."""
    half = width / 2.0
    arg = beta**2 - (2.0 * math.pi * half * x / m) ** 2
    rt = np.sqrt(np.abs(arg))
    a = np.where(arg > 0, np.sinh(rt) / np.maximum(rt, 1e-30), np.sinc(rt / math.pi))
    return (2.0 * half / np.i0(beta)) * a


def _spread_tables(
    theta_np: np.ndarray, pg: int, m: int, oversample: int, kernel_width: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense per-angle spreading matrices ``(W_x, W_y)``, each (A, Pg, m).

    ``W[a, k, j]`` is the separable KB weight with which polar sample
    (angle a, frequency k) lands on lattice row/column j (taps wrapped mod
    m exactly like the scatter path).  Host-side numpy: the tables depend
    only on geometry, so the TPU sees them as ready data and the gridding
    becomes per-angle matmuls on the MXU (``method="matmul"``) instead of a
    serialized 16-tap scatter-add.
    """
    beta = _kb_beta(kernel_width, oversample)
    half = kernel_width / 2.0
    k = np.fft.fftfreq(pg) * pg

    def kb_np(s: np.ndarray) -> np.ndarray:
        x = 1.0 - (s / half) ** 2
        val = np.i0(beta * np.sqrt(np.maximum(x, 0.0)))
        return np.where(x >= 0.0, val / np.i0(beta), 0.0)

    offs = np.arange(kernel_width) - (kernel_width // 2 - 1)

    def table(g: np.ndarray) -> np.ndarray:
        ix0 = np.floor(g).astype(np.int64)           # (A, Pg)
        W = np.zeros((g.shape[0], pg, m), np.float32)
        aa = np.arange(g.shape[0])[:, None]
        kk = np.arange(pg)[None, :]
        for d in offs:
            w = kb_np((ix0 + d) - g).astype(np.float32)
            j = np.mod(ix0 + d, m)
            np.add.at(W, (aa, kk, j), w)
        return W

    gx = k[None, :] * (oversample * -np.sin(theta_np))[:, None]
    gy = k[None, :] * (oversample * np.cos(theta_np))[:, None]
    return table(gx), table(gy)


def gridrec(
    sinogram: Array,
    theta: Array,
    x_size: int,
    y_size: int,
    filter_name: str = "ramp",
    oversample: int = 2,
    kernel_width: int = 4,
    method: str = "auto",
) -> Array:
    """Fourier-regridding reconstruction of ``sinogram`` (..., A, P).

    Drop-in signature-compatible with :func:`ct_pvae_tpu.ops.fbp.fbp`;
    angular density compensation (Voronoi cells on the half-circle) is built
    in, so nonuniform sparse-angle sets are handled like tomopy's regridder
    rather than with a uniform pi/A weight.

    ``method``: "scatter" = the original 16-tap scatter-add spread;
    "matmul" = the same spread as one (m, Pg) @ (Pg, m) MXU matmul per angle
    under ``lax.scan`` using host-precomputed dense KB tables (requires a
    CONCRETE ``theta`` — geometry known outside jit, as in the classical-init
    and merit paths).  TPU scatter serializes per index, so the matmul form
    trades ~kernel_width^2 x redundant FLOPs (free on an idle MXU) for the
    scatter's serialization; both paths are tested equal.  "auto" picks
    matmul when theta is concrete, else scatter.

    Returns: (..., x_size, y_size) real images.
    """
    a, p = sinogram.shape[-2], sinogram.shape[-1]
    batch_shape = sinogram.shape[:-2]
    sino = sinogram.reshape((-1, a, p)).astype(jnp.float32)
    theta = jnp.asarray(theta, jnp.float32)
    if theta.ndim == 0:
        theta = theta[None]

    pg = 1 << max(int(math.ceil(math.log2(max(p, 2)))), 1)   # padded detector
    m = oversample * pg                                       # lattice size
    beta = _kb_beta(kernel_width, oversample)

    # --- 1. polar spectrum samples -------------------------------------
    # Center-referenced DFT: F1[a,k] = sum_t p[a,t] exp(-2 pi i k (t-ct)/pg).
    ct = (p - 1) / 2.0
    pad = jnp.zeros(sino.shape[:-1] + (pg - p,), sino.dtype)
    spec = jnp.fft.fft(jnp.concatenate([sino, pad], axis=-1), axis=-1)
    # Static host-side phase/frequency tables (numpy): keeps the traced
    # graph free of complex transcendentals, which some TPU plugins lack.
    k_np = np.fft.fftfreq(pg) * pg                            # integer freqs
    k = jnp.asarray(k_np, jnp.float32)
    spec = spec * jnp.asarray(
        np.exp(2j * np.pi * k_np * ct / pg), jnp.complex64
    )                                                         # (B, A, Pg)

    # Polar quadrature mass: Voronoi d_theta x band-limited ramp (the
    # |omega| d_omega Jacobian; fourier_filter returns ~2|k|/pg with the
    # Kak & Slaney DC treatment, so divide by 2) x d_omega = 1/pg.
    omega = jnp.asarray(fourier_filter(pg, filter_name), jnp.float32)
    dtheta = voronoi_angle_weights(theta)                     # (A,)
    mass = spec * (dtheta[:, None] * (omega[None, :] * 0.5) / pg)

    # --- 2. spread onto the oversampled Cartesian lattice ---------------
    if method == "auto":
        # matmul needs concrete geometry and 2 dense (A, Pg, m) tables; cap
        # the table footprint so stretch geometries don't surprise-allocate
        table_mb = 2 * a * pg * m * 4 / 2**20
        method = (
            "scatter"
            if isinstance(theta, jax.core.Tracer) or table_mb > 512
            else "matmul"
        )
    if method == "matmul":
        # grid_b = sum_a W_x[a]^T @ diag(mass_b[a]) @ W_y[a]: one MXU matmul
        # chain per angle under lax.scan — no scatter (TPU scatters
        # serialize per index; measured: the scatter spread dominated the
        # whole reconstruction).  HIGHEST precision keeps the spread
        # f32-accurate so both methods agree to fp tolerance.
        wx_np, wy_np = _spread_tables(
            np.asarray(theta, np.float64), pg, m, oversample, kernel_width
        )
        wx_t = jnp.asarray(wx_np)                             # (A, Pg, m)
        wy_t = jnp.asarray(wy_np)
        mass_r = jnp.transpose(jnp.real(mass), (1, 0, 2))     # (A, B, Pg)
        mass_i = jnp.transpose(jnp.imag(mass), (1, 0, 2))
        hi = jax.lax.Precision.HIGHEST

        def body(grid_acc, inp):
            wxa, wya, mr, mi = inp
            mr_w = mr[:, :, None] * wya[None]                 # (B, Pg, m)
            mi_w = mi[:, :, None] * wya[None]
            gr = jnp.einsum("km,bkn->bmn", wxa, mr_w, precision=hi)
            gi = jnp.einsum("km,bkn->bmn", wxa, mi_w, precision=hi)
            return grid_acc + jax.lax.complex(gr, gi), None

        grid0 = jnp.zeros((sino.shape[0], m, m), jnp.complex64)
        grid, _ = jax.lax.scan(body, grid0, (wx_t, wy_t, mass_r, mass_i))
    elif method == "scatter":
        # Sample position in lattice units (spacing 1/m cycles/pixel):
        # nu = (k/pg) * (-sin t, cos t)  ->  g = k * osf * (-sin t, cos t).
        gx = k[None, :] * (oversample * -jnp.sin(theta))[:, None]  # (A, Pg)
        gy = k[None, :] * (oversample * jnp.cos(theta))[:, None]
        ix0 = jnp.floor(gx).astype(jnp.int32)
        iy0 = jnp.floor(gy).astype(jnp.int32)

        offs = jnp.arange(kernel_width, dtype=jnp.int32) - (kernel_width // 2 - 1)
        grid = jnp.zeros((sino.shape[0], m, m), jnp.complex64)
        flat_mass = mass.reshape(sino.shape[0], -1)           # (B, A*Pg)
        fx = (ix0 - gx).reshape(-1)                           # (A*Pg,)
        fy = (iy0 - gy).reshape(-1)
        ix0f = ix0.reshape(-1)
        iy0f = iy0.reshape(-1)
        for dx in offs:
            wx = _kb_kernel(fx + dx, kernel_width, beta)      # (A*Pg,)
            jx = jnp.mod(ix0f + dx, m)
            for dy in offs:
                wy = _kb_kernel(fy + dy, kernel_width, beta)
                jy = jnp.mod(iy0f + dy, m)
                grid = grid.at[:, jx, jy].add(flat_mass * (wx * wy))
    else:
        raise ValueError(f"unknown method {method!r} (use 'auto'/'matmul'/'scatter')")

    # --- 3. inverse FFT, deapodize, crop --------------------------------
    # f(x-cx, y-cy) = sum_m G[m] exp(2 pi i ((x-cx) mx + (y-cy) my)/m):
    # fold the -c offset into a phase ramp, then m^2 * ifft2.
    cx = (x_size - 1) / 2.0
    cy = (y_size - 1) / 2.0
    km = np.fft.fftfreq(m) * m
    phase_x = jnp.asarray(np.exp(-2j * np.pi * km * cx / m), jnp.complex64)
    phase_y = jnp.asarray(np.exp(-2j * np.pi * km * cy / m), jnp.complex64)
    grid = grid * phase_x[None, :, None] * phase_y[None, None, :]
    img = jnp.fft.ifft2(grid, axes=(-2, -1)) * (m * m)
    img = jnp.real(img[:, :x_size, :y_size])

    apod_x = _kb_apodization(np.arange(x_size) - cx, kernel_width, beta, m)
    apod_y = _kb_apodization(np.arange(y_size) - cy, kernel_width, beta, m)
    img = img / jnp.asarray(np.outer(apod_x, apod_y), jnp.float32)
    return img.reshape(batch_shape + (x_size, y_size))
