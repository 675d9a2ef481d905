"""Differentiable Radon transform (forward projector) and adjoint.

TPU-native re-design of the reference projector (forward_functions.py:49-123),
which tiles the phantom over angles and calls a CUDA image-rotate op, then sums
rows.  Here the projector is expressed directly as a batched line-integral with
bilinear sampling:

    p_theta[t] = sum_s  f( c + s*u(theta) + t_hat*v(theta) )

with u = (cos t, sin t), v = (-sin t, cos t), unit steps in s, and 4-tap
bilinear interpolation.  This is mathematically the reference's
rotate(-theta)+column-sum (and strictly better than it: the reference's fast
path uses *nearest* interpolation, tfa.image.rotate's default), but maps to XLA
as one fused gather per tap over a static (A, S, P) grid — no dynamic shapes,
no host loops, vectorized over (batch, angle, detector).

Geometry convention (shared with fbp.py — verified consistent by
tests/test_radon.py):

  * image f[x, y], centered coords X = x - (H-1)/2, Y = y - (W-1)/2
  * theta = 0:  p[t] = sum_x f[x, t]                    (column sums)
  * a point (X, Y) hits detector coordinate t_hat = Y cos(theta) - X sin(theta)
    (matching reference fbp_tensorflow.py:59)

The adjoint `backproject` is pixel-driven (gather along the detector axis) and
is used by FBP/SIRT.  Gradients of `radon` flow through the gathers via JAX's
exact scatter-add transpose, so <A x, y> == <x, A^T y> holds by construction
for the autodiff adjoint.  A Pallas projector kernel (ops/pallas_radon.py)
accelerates the same contract on TPU for large grids.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def num_proj_pixels(h: int, w: int) -> int:
    """Detector size for a padded projection of an (h, w) image.

    Matches reference pad_phantom (forward_functions.py:29-30):
    ceil((sqrt(h^2+w^2)+2)/2) * 2.
    """
    p = math.sqrt(h * h + w * w) + 2.0
    return int(math.ceil(p / 2.0) * 2)


def pad_phantom(phantom: Array, n_det: Optional[int] = None) -> Array:
    """Zero-pad the trailing two (spatial) dims to (n_det, n_det).

    Padding split matches the reference (forward_functions.py:32-44): ``pad//2``
    in front, remainder (including the odd pixel) at the back.
    """
    h, w = phantom.shape[-2], phantom.shape[-1]
    if n_det is None:
        n_det = num_proj_pixels(h, w)
    padx, pady = n_det - h, n_det - w
    pads = [(0, 0)] * (phantom.ndim - 2) + [
        (padx // 2, padx - padx // 2),
        (pady // 2, pady - pady // 2),
    ]
    return jnp.pad(phantom, pads)


def _sample_grid(theta: Array, n_s: int, n_det: int, h: int, w: int):
    """Sample coordinates for all (angle, step, detector) triples.

    Returns X, Y index grids of shape (A, n_s, n_det) in array (uncentered)
    coordinates.
    """
    cx = (h - 1) / 2.0
    cy = (w - 1) / 2.0
    ct = (n_det - 1) / 2.0
    s = (jnp.arange(n_s, dtype=jnp.float32) - (n_s - 1) / 2.0)[None, :, None]
    t_hat = (jnp.arange(n_det, dtype=jnp.float32) - ct)[None, None, :]
    cos = jnp.cos(theta).astype(jnp.float32)[:, None, None]
    sin = jnp.sin(theta).astype(jnp.float32)[:, None, None]
    x = s * cos - t_hat * sin + cx
    y = s * sin + t_hat * cos + cy
    return x, y


def _bilinear_taps(x: Array, y: Array, h: int, w: int):
    """4 bilinear taps: flat indices into an (h, w) image plus weights.

    Out-of-bounds taps get zero weight (image is zero outside its support).
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    taps = []
    for dx, dy, wgt in (
        (0, 0, (1 - wx) * (1 - wy)),
        (1, 0, wx * (1 - wy)),
        (0, 1, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= h - 1) & (yi >= 0) & (yi <= w - 1)
        xi_c = jnp.clip(xi, 0, h - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, w - 1).astype(jnp.int32)
        flat = xi_c * w + yi_c
        taps.append((flat, jnp.where(valid, wgt, 0.0)))
    return taps


@partial(jax.jit, static_argnames=("pad", "n_det"))
def radon(
    image: Array,
    theta: Array,
    *,
    pad: bool = False,
    n_det: Optional[int] = None,
) -> Array:
    """Radon transform of ``image`` at angles ``theta``.

    Args:
      image: (..., H, W) — any leading batch dims.
      theta: (A,) angles in radians.
      pad: if True, zero-pad spatial dims to the diagonal-covering detector
        size first (reference ``pad=True`` path).
      n_det: detector pixel count; defaults to H after optional padding
        (requires H == W, which padding guarantees).

    Returns:
      (..., A, n_det) sinogram.
    """
    if pad:
        image = pad_phantom(image, n_det)
    h, w = image.shape[-2], image.shape[-1]
    if n_det is None:
        if h != w:
            raise ValueError("unpadded radon requires square images; use pad=True")
        n_det = h
    a = theta.shape[0]
    batch_shape = image.shape[:-2]
    img_flat = image.reshape((-1, h * w))  # (B, H*W)

    n_s = h  # unit steps along the ray cover the (padded) image support
    x, y = _sample_grid(theta, n_s, n_det, h, w)
    taps = _bilinear_taps(x, y, h, w)

    def gather_tap(flat_idx, wgt):
        # (B, A, S, P): gather along the flattened image axis.
        vals = jnp.take(img_flat, flat_idx.reshape(-1), axis=-1)
        return vals.reshape((-1, a, n_s, n_det)) * wgt[None]

    sino = sum(gather_tap(fi, wg) for fi, wg in taps)
    sino = jnp.sum(sino, axis=2)  # integrate over ray steps
    return sino.reshape(batch_shape + (a, n_det))


@partial(jax.jit, static_argnames=("pad", "n_det", "angle_chunk"))
def radon_low_mem(
    image: Array,
    theta: Array,
    *,
    pad: bool = False,
    n_det: Optional[int] = None,
    angle_chunk: int = 8,
) -> Array:
    """Memory-bounded Radon transform: ``lax.map`` over angle chunks.

    The reference keeps a per-angle-loop variant for exactly this purpose
    (``project_tf_low_mem``, forward_functions.py:49-78).  :func:`radon`
    materializes (B, A, S, P) gather intermediates — ~400 MB per bilinear tap
    at B=16, A=180, 184² — while this variant bounds the live intermediate to
    ``angle_chunk/A`` of that, trading one sequential scan over angle chunks.
    Same math, same gradients (scan differentiates chunk-wise).

    ``A`` must be divisible by ``angle_chunk`` (pad theta or pick a divisor).
    """
    if pad:
        image = pad_phantom(image, n_det)
    h, w = image.shape[-2], image.shape[-1]
    if n_det is None:
        if h != w:
            raise ValueError("unpadded radon requires square images; use pad=True")
        n_det = h
    a = theta.shape[0]
    if a % angle_chunk != 0:
        raise ValueError(f"angle count {a} not divisible by angle_chunk {angle_chunk}")
    theta_chunks = theta.reshape((a // angle_chunk, angle_chunk))
    sino_chunks = jax.lax.map(
        lambda th: radon(image, th, pad=False, n_det=n_det), theta_chunks
    )  # (A/chunk, ..., chunk, P)
    sino = jnp.moveaxis(sino_chunks, 0, -3)  # (..., A/chunk, chunk, P)
    return sino.reshape(image.shape[:-2] + (a, n_det))


def radon_fast(
    image: Array,
    theta,
    *,
    pad: bool = False,
    n_det: Optional[int] = None,
) -> Array:
    """Radon transform using the Pallas MXU kernel on TPU, XLA gather elsewhere.

    Requires a CONCRETE (host) theta array: the Pallas path precomputes
    per-angle interpolation scalars and the x-/y-major grouping at trace time.
    Use plain :func:`radon` where theta is traced (e.g. stochastic angle
    subsets inside the training step — a negligible cost there anyway).
    """
    import numpy as _np

    theta_np = _np.asarray(theta)
    if jax.default_backend() != "tpu":
        return radon(image, jnp.asarray(theta_np, jnp.float32), pad=pad, n_det=n_det)
    if pad:
        image = pad_phantom(image, n_det)
    h, w = image.shape[-2], image.shape[-1]
    if n_det is None:
        n_det = h
    from .pallas_radon import radon_pallas

    batch_shape = image.shape[:-2]
    flat = image.reshape((-1, h, w))
    out = radon_pallas(flat, tuple(float(t) for t in theta_np), n_det)
    return out.reshape(batch_shape + (len(theta_np), n_det))


@partial(jax.jit, static_argnames=("x_size", "y_size", "angle_chunk"))
def backproject(
    sinogram: Array,
    theta: Array,
    x_size: int,
    y_size: int,
    angle_chunk: int = 32,
) -> Array:
    """Pixel-driven (unfiltered) backprojection — adjoint-style operator.

    For each output pixel (x, y), linearly interpolates each angle's projection
    at t = Y cos(theta) - X sin(theta) + c_t and sums over angles (the
    vectorized form of reference fbp_tensorflow.py:52-72, which loops angles in
    Python).  Edge values are clamped (constant extension), matching
    tfp.math.interp_regular_1d_grid's default used by the reference.

    The angle sum runs as a ``lax.scan`` over ``angle_chunk``-sized angle
    blocks: materializing all (A, X, Y) interpolation coordinates at once is
    fine at the 184-pixel foam geometry but allocates ~100 GB at stretch
    scale (360 angles x 728^2 under remat — the compile-time OOM that blocked
    the 512^2 configuration), while chunking bounds live memory at
    chunk x X x Y with identical results (the angle sum is associative).

    Args:
      sinogram: (..., A, P)
      theta: (A,)
    Returns:
      (..., x_size, y_size)
    """
    a, p = sinogram.shape[-2], sinogram.shape[-1]
    batch_shape = sinogram.shape[:-2]
    sino_flat = sinogram.reshape((-1, a, p))
    b = sino_flat.shape[0]

    cx = (x_size - 1) / 2.0
    cy = (y_size - 1) / 2.0
    ct = (p - 1) / 2.0
    xg = (jnp.arange(x_size, dtype=jnp.float32) - cx)[:, None]
    yg = (jnp.arange(y_size, dtype=jnp.float32) - cy)[None, :]

    chunk = max(1, min(int(angle_chunk), a))
    pad = (-a) % chunk
    theta_p = jnp.pad(jnp.asarray(theta, jnp.float32), (0, pad))
    # padded angles contribute through zero sinogram rows -> exact no-op
    sino_p = jnp.pad(sino_flat, ((0, 0), (0, pad), (0, 0)))
    n_ch = (a + pad) // chunk
    theta_ch = theta_p.reshape(n_ch, chunk)
    sino_ch = jnp.moveaxis(sino_p.reshape(b, n_ch, chunk, p), 1, 0)  # (n_ch, B, chunk, P)

    def one_chunk(acc, xs):
        th_c, sino_c = xs                       # (chunk,), (B, chunk, P)
        cos = jnp.cos(th_c)[:, None, None]
        sin = jnp.sin(th_c)[:, None, None]
        t = yg[None] * cos - xg[None] * sin + ct  # (chunk, X, Y)
        t0 = jnp.floor(t)
        wt = (t - t0).reshape(chunk, 1, -1)
        i0 = jnp.clip(t0, 0, p - 1).astype(jnp.int32).reshape(chunk, 1, -1)
        i1 = jnp.clip(t0 + 1, 0, p - 1).astype(jnp.int32).reshape(chunk, 1, -1)

        def interp(sino_b):  # (chunk, P) -> (X, Y)
            v0 = jnp.take_along_axis(sino_b[:, None, :], i0, axis=-1)
            v1 = jnp.take_along_axis(sino_b[:, None, :], i1, axis=-1)
            v = v0 * (1 - wt) + v1 * wt
            return jnp.sum(v.reshape(chunk, x_size, y_size), axis=0)

        return acc + jax.vmap(interp)(sino_c), None

    out, _ = jax.lax.scan(
        one_chunk,
        jnp.zeros((b, x_size, y_size), jnp.float32),
        (theta_ch, sino_ch),
    )
    return out.reshape(batch_shape + (x_size, y_size))


@jax.jit
def rotate_image(images: Array, angles: Array) -> Array:
    """Bilinear center-rotation of a batch of images, one angle per image.

    The TPU-native replacement for the reference's remaining
    ``tfa.image.rotate`` call site — the (disabled) random-roll augmentation
    rotates the encoder-input stack to match a rolled sinogram
    (helper_functions.py:138-142).  Positive ``angles`` rotate the object the
    same way the projector's angle axis advances, so
    ``radon(rotate_image(x, phi)) == roll(radon(x))`` (see vi/augment.py).
    Zero fill outside the support.

    Args:
      images: (B, H, W) or (B, H, W, C)
      angles: (B,) radians
    """
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    b, h, w, c = images.shape
    cx = (h - 1) / 2.0
    cy = (w - 1) / 2.0
    xg, yg = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )

    def one(img, ang):
        cos = jnp.cos(ang)
        sin = jnp.sin(ang)
        # sample source at coordinates rotated by -ang (pull-back)
        xs = cos * (xg - cx) + sin * (yg - cy) + cx
        ys = -sin * (xg - cx) + cos * (yg - cy) + cy
        taps = _bilinear_taps(xs, ys, h, w)
        flat = img.reshape(h * w, c)
        return sum(
            jnp.take(flat, fi.reshape(-1), axis=0).reshape(h, w, c) * wg[..., None]
            for fi, wg in taps
        )

    out = jax.vmap(one)(images, angles.astype(jnp.float32))
    return out[..., 0] if squeeze else out
