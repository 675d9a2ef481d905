"""Total-variation regularized reconstruction (Chambolle-Pock) in JAX.

TPU-native equivalent of tomopy's C ``tv`` algorithm, offered by the reference
as an optional classical-init (``--algorithms tv``, helper_functions.py:503,
README paper recipe).  Solves

    min_x  0.5 || A x - p ||^2 + lam * TV(x)

with the primal-dual (Chambolle-Pock) scheme, using the same projector/adjoint
pair as SIRT, all under one ``lax.scan``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .radon import backproject, radon

Array = jnp.ndarray


def _grad(x: Array):
    gx = jnp.diff(x, axis=-2, append=x[..., -1:, :])
    gy = jnp.diff(x, axis=-1, append=x[..., :, -1:])
    return gx, gy


def _div(gx: Array, gy: Array) -> Array:
    dx = jnp.concatenate([gx[..., :1, :], gx[..., 1:-1, :] - gx[..., :-2, :], -gx[..., -2:-1, :]], axis=-2)
    dy = jnp.concatenate([gy[..., :, :1], gy[..., :, 1:-1] - gy[..., :, :-2], -gy[..., :, -2:-1]], axis=-1)
    return dx + dy


def tv_with_ops(
    sinogram: Array,
    fwd,
    adj,
    x_size: int,
    y_size: int,
    num_iter: int = 50,
    lam: float = 0.05,
    sigma: float = 0.5,
    tau: float = 1e-3,
) -> Array:
    """Chambolle-Pock TV with an injected projector/adjoint pair.

    Not jitted — the caller jits.  Used by data/recon_init.py to run the
    60 fwd+adj applications through the Pallas MXU kernels (exact transpose
    pair) when angles are concrete."""
    shape_img = sinogram.shape[:-2] + (x_size, y_size)
    x = jnp.zeros(shape_img, sinogram.dtype)
    xbar = x
    y_fid = jnp.zeros_like(sinogram)  # dual for the data term
    y_gx = jnp.zeros_like(x)  # dual for TV
    y_gy = jnp.zeros_like(x)

    def body(carry, _):
        x, xbar, y_fid, y_gx, y_gy = carry
        # dual updates
        y_fid = (y_fid + sigma * (fwd(xbar) - sinogram)) / (1.0 + sigma)
        gx, gy = _grad(xbar)
        y_gx = y_gx + sigma * gx
        y_gy = y_gy + sigma * gy
        mag = jnp.sqrt(y_gx**2 + y_gy**2)
        scale = jnp.clip(mag / lam, 1.0, None)
        y_gx = y_gx / scale
        y_gy = y_gy / scale
        # primal update
        x_new = x - tau * (adj(y_fid) - _div(y_gx, y_gy))
        x_new = jax.nn.relu(x_new)
        xbar = 2.0 * x_new - x
        return (x_new, xbar, y_fid, y_gx, y_gy), None

    (x, *_), _ = jax.lax.scan(body, (x, xbar, y_fid, y_gx, y_gy), None, length=num_iter)
    return x


@partial(jax.jit, static_argnames=("x_size", "y_size", "num_iter"))
def tv_reconstruct(
    sinogram: Array,
    theta: Array,
    x_size: int,
    y_size: int,
    num_iter: int = 50,
    lam: float = 0.05,
    sigma: float = 0.5,
    tau: float = 1e-3,
) -> Array:
    """Chambolle-Pock TV reconstruction.

    Args:
      sinogram: (..., A, P)
      theta: (A,)
    Returns: (..., x_size, y_size)
    """
    p = sinogram.shape[-1]
    pad_like = p > x_size

    def fwd(img):
        return radon(img, theta, pad=pad_like, n_det=p)

    def adj(sino):
        size = p if pad_like else x_size
        full = backproject(sino, theta, size, size)
        if pad_like:
            ox = (p - x_size) // 2
            oy = (p - y_size) // 2
            full = full[..., ox : ox + x_size, oy : oy + y_size]
        return full

    return tv_with_ops(sinogram, fwd, adj, x_size, y_size, num_iter, lam, sigma, tau)
