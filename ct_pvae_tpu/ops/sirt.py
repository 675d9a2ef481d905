"""SIRT (Simultaneous Iterative Reconstruction Technique) in JAX.

The reference offers tomopy's C ``sirt`` as an optional classical-init
algorithm (``--algorithms sirt``, helper_functions.py:503, README recipe).
This is the standard SIRT update expressed with our projector/adjoint pair and
``lax.scan`` — one fused XLA loop, no host round-trips:

    x_{k+1} = relu( x_k + C A^T R (p - A x_k) )

with row/column inverse-sum normalizers R = 1/(A 1), C = 1/(A^T 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .radon import backproject, radon

Array = jnp.ndarray


def sirt_with_ops(
    sinogram: Array,
    fwd,
    adj,
    x_size: int,
    y_size: int,
    num_iter: int = 30,
    eps: float = 1e-6,
) -> Array:
    """SIRT with an injected projector/adjoint pair (not jitted — caller jits).

    Lets the classical-init stage run its 30 fwd+adj applications through the
    Pallas MXU kernels when angles are concrete (data/recon_init.py), while
    :func:`sirt` keeps the traced-theta XLA pair."""
    ones_img = jnp.ones(sinogram.shape[:-2] + (x_size, y_size), sinogram.dtype)
    row_sum = fwd(ones_img)  # A 1
    ones_sino = jnp.ones_like(sinogram)
    col_sum = adj(ones_sino)  # A^T 1
    r = 1.0 / jnp.clip(row_sum, eps, None)
    c = 1.0 / jnp.clip(col_sum, eps, None)

    def body(x, _):
        resid = sinogram - fwd(x)
        x = jax.nn.relu(x + c * adj(r * resid))
        return x, None

    x0 = jnp.zeros_like(ones_img)
    x_final, _ = jax.lax.scan(body, x0, None, length=num_iter)
    return x_final


@partial(jax.jit, static_argnames=("x_size", "y_size", "num_iter"))
def sirt(
    sinogram: Array,
    theta: Array,
    x_size: int,
    y_size: int,
    num_iter: int = 30,
    eps: float = 1e-6,
) -> Array:
    """SIRT reconstruction.

    Args:
      sinogram: (..., A, P)
      theta: (A,)
    Returns: (..., x_size, y_size)
    """
    p = sinogram.shape[-1]
    pad_like = p > x_size  # sinogram was generated from padded projections

    def fwd(img):
        return radon(img, theta, pad=pad_like, n_det=p)

    def adj(sino):
        full = backproject(sino, theta, p if pad_like else x_size, p if pad_like else y_size)
        if pad_like:
            ox = (p - x_size) // 2
            oy = (p - y_size) // 2
            full = full[..., ox : ox + x_size, oy : oy + y_size]
        return full

    return sirt_with_ops(sinogram, fwd, adj, x_size, y_size, num_iter, eps)
