"""Pallas TPU kernels for the Radon projector and its exact adjoint.

The reference's hottest op is a CUDA image-rotate (tfa.image.rotate) called on
angle-tiled batches (forward_functions.py:106-114).  On TPU, gather-style
rotation maps poorly to the VPU; instead the projector is recast as matrix
multiplication with interpolation weights generated on the fly in VMEM:

  Joseph's method, major-axis form.  For angle t with |cos t| >= |sin t|
  (x-major), the projection is

      p[t] = (1/|cos|) * sum_x  interp( f[x, :],  pos(x, t) )
      pos(x, t) = offset + slope_t * t + slope_r * x

  i.e. per row x a 1-D linear resample — a banded matrix G_x[y, t] =
  w * max(0, 1 - |y - pos(x, t)|).  The kernel loops rows, building each
  (W, T) weight tile with the VPU directly in VMEM (weights never touch HBM)
  and contracting (B, W) @ (W, T) on the MXU, accumulating (B, T) per angle.
  y-major angles run the same kernel on the transposed image with swapped
  trig scalars.

  The adjoint (backprojection of the same discretization) is the transposed
  contraction (B, T) @ (T, W) per row with the identical weight tile — an
  exact-transpose custom VJP (<Ax, y> == <x, A^T y> to float precision).

Layouts satisfy Mosaic's block constraints: images (B8, H8, Wpad) and outputs
(A, B8, Tpad) use whole-trailing-dim blocks (grid over batch tiles x angles);
per-angle scalars ride scalar-prefetch SMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_LANE = 128
_SUB = 8


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# VMEM budget for the resident (batch_tile, H, W) image/output block.  The
# per-cell working set is this block plus the (W, T) weight tile and small
# accumulators; 8 MB keeps the total well under the ~16 MB VMEM per core
# while still giving full-batch blocks for the training shapes
# (16 x 184 x 256 f32 = 3 MB).
_VMEM_BLOCK_BYTES = 8 * 1024 * 1024


def _batch_tile(b: int, h_pad: int, w_pad: int, n_blocks: int = 1) -> Tuple[int, int]:
    """(b_pad, tile) with tile a multiple of the sublane count dividing b_pad,
    sized so ``n_blocks`` resident (tile, h_pad, w_pad) f32 blocks fit the
    VMEM block budget together.

    The x2 accounts for Pallas double-buffering each input block across grid
    steps: at the old budget a merged ELBO batch of 80 x 128^2 picked tile 64,
    whose two 4 MB image blocks allocated 2x2x4 MB = 16.19 MB with scratch —
    192 KB over the 16 MB scoped-vmem limit (Mosaic stack OOM at compile).
    Shapes at or below the minimum tile (e.g. the 512^2 stretch case, tile 8)
    are unaffected.
    """
    per_elem = h_pad * w_pad * 4 * n_blocks * 2
    tile = max(_SUB, (_VMEM_BLOCK_BYTES // per_elem) // _SUB * _SUB)
    tile = min(tile, _ceil_to(b, _SUB))
    b_pad = _ceil_to(b, tile)
    return b_pad, tile


def _angle_scalars(theta: np.ndarray, h: int, w: int, n_det: int):
    """Split angles into x-major / y-major groups and compute per-angle
    (slope_t, slope_r, offset, weight) for the unified resample form.

    Geometry matches ops.radon: sample line for detector t at angle theta has
    y(x,t) = cy + (t_hat + (x-cx) sin)/cos          (x-major)
    x(y,t) = cx + ((y-cy) cos - t_hat)/sin          (y-major, on f^T)
    """
    theta = np.asarray(theta, np.float64)
    c = np.cos(theta)
    s = np.sin(theta)
    cx = (h - 1) / 2.0
    cy = (w - 1) / 2.0
    ct = (n_det - 1) / 2.0
    x_major = np.abs(c) >= np.abs(s)

    idx_x = np.nonzero(x_major)[0]
    idx_y = np.nonzero(~x_major)[0]
    sx = (
        np.stack(
            (
                1.0 / c[idx_x],
                s[idx_x] / c[idx_x],
                cy - ct / c[idx_x] - cx * (s[idx_x] / c[idx_x]),
                1.0 / np.abs(c[idx_x]),
            ),
            axis=-1,
        )
        if len(idx_x)
        else np.zeros((0, 4))
    )
    # y-major on f^T: x(y,t) = cx - t_hat/sin + (y-cy) * cos/sin
    sy = (
        np.stack(
            (
                -1.0 / s[idx_y],
                c[idx_y] / s[idx_y],
                cx + ct / s[idx_y] - cy * (c[idx_y] / s[idx_y]),
                1.0 / np.abs(s[idx_y]),
            ),
            axis=-1,
        )
        if len(idx_y)
        else np.zeros((0, 4))
    )
    return idx_x, sx.astype(np.float32), idx_y, sy.astype(np.float32)


def _fwd_kernel(scal_ref, img_ref, out_ref, g_scratch, acc_scratch, *, h: int, w_pad: int, t_pad: int):
    """One (batch_tile, angle) cell: out[a, B, :] = sum_x F[:, x, :] @ G_x."""
    import jax.lax as lax
    from jax.experimental import pallas as pl

    a = pl.program_id(1)
    slope_t = scal_ref[a, 0]
    slope_r = scal_ref[a, 1]
    offset = scal_ref[a, 2]
    weight = scal_ref[a, 3]

    yy = lax.broadcasted_iota(jnp.int32, (w_pad, t_pad), 0).astype(jnp.float32)
    tt = lax.broadcasted_iota(jnp.int32, (w_pad, t_pad), 1).astype(jnp.float32)

    acc_scratch[:, :] = jnp.zeros((acc_scratch.shape[0], acc_scratch.shape[1]), jnp.float32)

    def body(r, _):
        pos = offset + slope_t * tt + slope_r * r.astype(jnp.float32)
        g_scratch[:, :] = weight * jnp.maximum(0.0, 1.0 - jnp.abs(yy - pos))
        acc_scratch[:, :] += jnp.dot(
            img_ref[:, r, :], g_scratch[:, :], preferred_element_type=jnp.float32
        )
        return 0

    lax.fori_loop(0, h, body, 0)
    out_ref[0, :, :] = acc_scratch[:, :]


def _adj_kernel(scal_ref, sino_ref, out_ref, g_scratch, *, h: int, w_pad: int, t_pad: int):
    """One (batch_tile, angle) cell: out[:, x, :] += P[a, B, :] @ G_x^T.

    G is generated already-transposed, (T, W), so the contraction is a plain
    NN matmul on the MXU.
    """
    import jax.lax as lax
    from jax.experimental import pallas as pl

    a = pl.program_id(1)
    slope_t = scal_ref[a, 0]
    slope_r = scal_ref[a, 1]
    offset = scal_ref[a, 2]
    weight = scal_ref[a, 3]

    tt = lax.broadcasted_iota(jnp.int32, (t_pad, w_pad), 0).astype(jnp.float32)
    yy = lax.broadcasted_iota(jnp.int32, (t_pad, w_pad), 1).astype(jnp.float32)

    @pl.when(a == 0)
    def _():
        out_ref[:, :, :] = jnp.zeros(
            (out_ref.shape[0], out_ref.shape[1], out_ref.shape[2]), jnp.float32
        )

    def body(r, _):
        pos = offset + slope_t * tt + slope_r * r.astype(jnp.float32)
        g_scratch[:, :] = weight * jnp.maximum(0.0, 1.0 - jnp.abs(yy - pos))
        out_ref[:, r, :] += jnp.dot(
            sino_ref[0, :, :], g_scratch[:, :], preferred_element_type=jnp.float32
        )
        return 0

    lax.fori_loop(0, h, body, 0)


def _run_group(images: Array, scalars: np.ndarray, n_det: int, interpret: bool) -> Array:
    """Forward projection for one major-axis group: (B, A_g, n_det)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = images.shape
    a_g = scalars.shape[0]
    if a_g == 0:
        return jnp.zeros((b, 0, n_det), jnp.float32)
    h_pad = _ceil_to(h, _SUB)
    w_pad = _ceil_to(w, _LANE)
    t_pad = _ceil_to(n_det, _LANE)
    b_pad, b_tile = _batch_tile(b, h_pad, w_pad)
    imgs = jnp.pad(
        images, ((0, b_pad - b), (0, h_pad - h), (0, w_pad - w))
    ).astype(jnp.float32)

    kernel = functools.partial(_fwd_kernel, h=h, w_pad=w_pad, t_pad=t_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // b_tile, a_g),
        in_specs=[pl.BlockSpec((b_tile, h_pad, w_pad), lambda bt, a, *_: (bt, 0, 0))],
        out_specs=pl.BlockSpec((1, b_tile, t_pad), lambda bt, a, *_: (a, bt, 0)),
        scratch_shapes=[
            pltpu.VMEM((w_pad, t_pad), jnp.float32),
            pltpu.VMEM((b_tile, t_pad), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((a_g, b_pad, t_pad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(scalars), imgs)
    return jnp.transpose(out[:, :b, :n_det], (1, 0, 2))


def _run_group_adj(sino: Array, scalars: np.ndarray, h: int, w: int, interpret: bool) -> Array:
    """Adjoint for one group: (B, A_g, n_det) -> (B, h, w)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, a_g, n_det = sino.shape
    if a_g == 0:
        return jnp.zeros((b, h, w), jnp.float32)
    h_pad = _ceil_to(h, _SUB)
    w_pad = _ceil_to(w, _LANE)
    t_pad = _ceil_to(n_det, _LANE)
    b_pad, b_tile = _batch_tile(b, h_pad, w_pad)
    sino_p = jnp.pad(
        jnp.transpose(sino, (1, 0, 2)),
        ((0, 0), (0, b_pad - b), (0, t_pad - n_det)),
    ).astype(jnp.float32)

    kernel = functools.partial(_adj_kernel, h=h, w_pad=w_pad, t_pad=t_pad)
    # grid iterates angles innermost, so each batch tile's (b_tile, H, W)
    # output block stays VMEM-resident across its whole angle accumulation
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // b_tile, a_g),
        in_specs=[pl.BlockSpec((1, b_tile, t_pad), lambda bt, a, *_: (a, bt, 0))],
        out_specs=pl.BlockSpec((b_tile, h_pad, w_pad), lambda bt, a, *_: (bt, 0, 0)),
        scratch_shapes=[pltpu.VMEM((t_pad, w_pad), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, h_pad, w_pad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(scalars), sino_p)
    return out[:b, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def radon_pallas(image: Array, theta_tuple: Tuple[float, ...], n_det: int, interpret: bool = False) -> Array:
    """Joseph-method Radon transform on TPU via Pallas.

    Args:
      image: (B, H, W) float32.
      theta_tuple: static tuple of angles (hashable for the custom_vjp).
      n_det: detector pixel count.
    Returns: (B, A, n_det).
    """
    return _radon_pallas_fwd_impl(image, theta_tuple, n_det, interpret)


def _radon_pallas_fwd_impl(image, theta_tuple, n_det, interpret):
    b, h, w = image.shape
    theta = np.asarray(theta_tuple, np.float64)
    idx_x, sx, idx_y, sy = _angle_scalars(theta, h, w, n_det)
    out = jnp.zeros((b, len(theta), n_det), jnp.float32)
    if len(idx_x):
        px = _run_group(image.astype(jnp.float32), sx, n_det, interpret)
        out = out.at[:, jnp.asarray(idx_x), :].set(px)
    if len(idx_y):
        py = _run_group(jnp.swapaxes(image, 1, 2).astype(jnp.float32), sy, n_det, interpret)
        out = out.at[:, jnp.asarray(idx_y), :].set(py)
    return out


def _radon_pallas_fwd(image, theta_tuple, n_det, interpret):
    return _radon_pallas_fwd_impl(image, theta_tuple, n_det, interpret), image.shape


def _radon_pallas_bwd(theta_tuple, n_det, interpret, shape, g):
    b, h, w = shape
    theta = np.asarray(theta_tuple, np.float64)
    idx_x, sx, idx_y, sy = _angle_scalars(theta, h, w, n_det)
    grad = jnp.zeros((b, h, w), jnp.float32)
    if len(idx_x):
        gx = g[:, jnp.asarray(idx_x), :]
        grad = grad + _run_group_adj(gx, sx, h, w, interpret)
    if len(idx_y):
        gy = g[:, jnp.asarray(idx_y), :]
        grad = grad + jnp.swapaxes(_run_group_adj(gy, sy, w, h, interpret), 1, 2)
    return (grad,)


radon_pallas.defvjp(_radon_pallas_fwd, _radon_pallas_bwd)


def backproject_pallas(
    sinogram: Array, theta_tuple: Tuple[float, ...], h: int, w: int, interpret: bool = False
) -> Array:
    """Unfiltered backprojection (exact adjoint of radon_pallas)."""
    b, a, n_det = sinogram.shape
    theta = np.asarray(theta_tuple, np.float64)
    idx_x, sx, idx_y, sy = _angle_scalars(theta, h, w, n_det)
    out = jnp.zeros((b, h, w), jnp.float32)
    if len(idx_x):
        gx = sinogram[:, jnp.asarray(idx_x), :]
        out = out + _run_group_adj(gx, sx, h, w, interpret)
    if len(idx_y):
        gy = sinogram[:, jnp.asarray(idx_y), :]
        out = out + jnp.swapaxes(_run_group_adj(gy, sy, w, h, interpret), 1, 2)
    return out


# ---------------------------------------------------------------------------
# Dynamic-angle variant: traced angle subsets (stochastic angle subsampling in
# the training loss, helper_functions.py:350-357).  The kernels take their
# per-angle scalars from SMEM, so the scalar TABLE may be a traced gather —
# only the x-/y-major group membership must be static.  Trick: build two
# static full-angle tables (x-major and y-major), each with wrong-group rows
# masked to zero weight and a far-away offset; project with BOTH kernels and
# add.  Wrong-group rows contribute exactly zero, so the sum equals the
# grouped projection at 2x kernel cost (still ~40x faster than the XLA gather
# path on TPU).  Kept as the reference implementation; the production path is
# radon_pallas_fused below, which removes the 2x by selecting the row source
# per angle inside ONE kernel.
# ---------------------------------------------------------------------------


def angle_tables(theta: np.ndarray, h: int, w: int, n_det: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (A, 4) scalar tables for the x-major and y-major kernels.

    Wrong-group rows are masked with weight 0 and offset -1e9 (positions far
    outside the tile, so every hat weight is exactly 0 — no inf/NaN arithmetic
    reaches the weight computation).
    """
    theta = np.asarray(theta, np.float64)
    c = np.cos(theta)
    s = np.sin(theta)
    cx = (h - 1) / 2.0
    cy = (w - 1) / 2.0
    ct = (n_det - 1) / 2.0
    x_major = np.abs(c) >= np.abs(s)

    safe_c = np.where(x_major, c, 1.0)
    tx = np.stack(
        (
            np.where(x_major, 1.0 / safe_c, 0.0),
            np.where(x_major, s / safe_c, 0.0),
            np.where(x_major, cy - ct / safe_c - cx * (s / safe_c), -1e9),
            np.where(x_major, 1.0 / np.abs(safe_c), 0.0),
        ),
        axis=-1,
    )
    safe_s = np.where(~x_major, s, 1.0)
    ty = np.stack(
        (
            np.where(~x_major, -1.0 / safe_s, 0.0),
            np.where(~x_major, c / safe_s, 0.0),
            np.where(~x_major, cx + ct / safe_s - cy * (c / safe_s), -1e9),
            np.where(~x_major, 1.0 / np.abs(safe_s), 0.0),
        ),
        axis=-1,
    )
    return tx.astype(np.float32), ty.astype(np.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def radon_pallas_dynamic(
    image: Array,     # (B, H, W), H == W
    scal_x: Array,    # (A_sub, 4) traced gather of angle_tables()[0]
    scal_y: Array,    # (A_sub, 4) traced gather of angle_tables()[1]
    n_det: int,
    interpret: bool = False,
) -> Array:
    """Radon transform for a traced angle subset: (B, A_sub, n_det)."""
    px = _run_group(image.astype(jnp.float32), scal_x, n_det, interpret)
    py = _run_group(jnp.swapaxes(image, 1, 2).astype(jnp.float32), scal_y, n_det, interpret)
    return px + py


def _radon_dyn_fwd(image, scal_x, scal_y, n_det, interpret):
    out = radon_pallas_dynamic(image, scal_x, scal_y, n_det, interpret)
    return out, (image.shape, scal_x, scal_y)


def _radon_dyn_bwd(n_det, interpret, res, g):
    (b, h, w), scal_x, scal_y = res
    gx = _run_group_adj(g, scal_x, h, w, interpret)
    gy = jnp.swapaxes(_run_group_adj(g, scal_y, w, h, interpret), 1, 2)
    return (gx + gy, jnp.zeros_like(scal_x), jnp.zeros_like(scal_y))


radon_pallas_dynamic.defvjp(_radon_dyn_fwd, _radon_dyn_bwd)


# ---------------------------------------------------------------------------
# Fused dual-axis variant: ONE kernel pass over the angle grid.  The dual-
# table form above runs BOTH the x-major and y-major kernels over every angle
# (wrong-group rows masked to zero weight), doubling matmul and weight-tile
# work.  Here the per-angle scalar row carries its own group flag and the
# kernel keeps the image AND its transpose resident, selecting the row source
# per angle — each angle cell does exactly one weight tile + one (B, W) @
# (W, T) chain, halving the dynamic path's projector FLOPs.  Requires square
# images (H == W), which the training path guarantees (recon padded to
# n_det x n_det).
# ---------------------------------------------------------------------------


def angle_table_fused(theta: np.ndarray, h: int, w: int, n_det: int) -> np.ndarray:
    """Static (A, 5) table: (slope_t, slope_r, offset, weight, is_y_major).

    Row a holds the x-major scalars when |cos| >= |sin| (flag 0) and the
    y-major (transposed-image) scalars otherwise (flag 1) — the same geometry
    as :func:`_angle_scalars`, merged into one table.
    """
    assert h == w, "fused dynamic projector requires square images"
    theta = np.asarray(theta, np.float64)
    c = np.cos(theta)
    s = np.sin(theta)
    cx = (h - 1) / 2.0
    cy = (w - 1) / 2.0
    ct = (n_det - 1) / 2.0
    x_major = np.abs(c) >= np.abs(s)

    safe_c = np.where(x_major, c, 1.0)
    safe_s = np.where(~x_major, s, 1.0)
    tab = np.stack(
        (
            np.where(x_major, 1.0 / safe_c, -1.0 / safe_s),
            np.where(x_major, s / safe_c, c / safe_s),
            np.where(
                x_major,
                cy - ct / safe_c - cx * (s / safe_c),
                cx + ct / safe_s - cy * (c / safe_s),
            ),
            np.where(x_major, 1.0 / np.abs(safe_c), 1.0 / np.abs(safe_s)),
            np.where(x_major, 0.0, 1.0),
        ),
        axis=-1,
    )
    return tab.astype(np.float32)


def _fwd_kernel_fused(
    scal_ref, img_ref, imgt_ref, out_ref, g_scratch, acc_scratch, *, h: int, w_pad: int, t_pad: int
):
    """One (batch_tile, angle) cell; row source picked by the group flag."""
    import jax.lax as lax
    from jax.experimental import pallas as pl

    a = pl.program_id(1)
    slope_t = scal_ref[a, 0]
    slope_r = scal_ref[a, 1]
    offset = scal_ref[a, 2]
    weight = scal_ref[a, 3]
    is_y = scal_ref[a, 4] > 0.5

    yy = lax.broadcasted_iota(jnp.int32, (w_pad, t_pad), 0).astype(jnp.float32)
    tt = lax.broadcasted_iota(jnp.int32, (w_pad, t_pad), 1).astype(jnp.float32)

    acc_scratch[:, :] = jnp.zeros((acc_scratch.shape[0], acc_scratch.shape[1]), jnp.float32)

    def body(r, _):
        pos = offset + slope_t * tt + slope_r * r.astype(jnp.float32)
        g_scratch[:, :] = weight * jnp.maximum(0.0, 1.0 - jnp.abs(yy - pos))
        row = jnp.where(is_y, imgt_ref[:, r, :], img_ref[:, r, :])
        acc_scratch[:, :] += jnp.dot(
            row, g_scratch[:, :], preferred_element_type=jnp.float32
        )
        return 0

    lax.fori_loop(0, h, body, 0)
    out_ref[0, :, :] = acc_scratch[:, :]


def _adj_kernel_fused(scal_ref, sino_ref, out_ref, outt_ref, g_scratch, *, h: int, w_pad: int, t_pad: int):
    """Adjoint cell: accumulate into the straight or transposed image grad."""
    import jax.lax as lax
    from jax.experimental import pallas as pl

    a = pl.program_id(1)
    slope_t = scal_ref[a, 0]
    slope_r = scal_ref[a, 1]
    offset = scal_ref[a, 2]
    weight = scal_ref[a, 3]
    is_y = scal_ref[a, 4] > 0.5

    tt = lax.broadcasted_iota(jnp.int32, (t_pad, w_pad), 0).astype(jnp.float32)
    yy = lax.broadcasted_iota(jnp.int32, (t_pad, w_pad), 1).astype(jnp.float32)

    @pl.when(a == 0)
    def _():
        out_ref[:, :, :] = jnp.zeros(
            (out_ref.shape[0], out_ref.shape[1], out_ref.shape[2]), jnp.float32
        )
        outt_ref[:, :, :] = jnp.zeros(
            (outt_ref.shape[0], outt_ref.shape[1], outt_ref.shape[2]), jnp.float32
        )

    def body(r, _):
        pos = offset + slope_t * tt + slope_r * r.astype(jnp.float32)
        g_scratch[:, :] = weight * jnp.maximum(0.0, 1.0 - jnp.abs(yy - pos))
        contrib = jnp.dot(
            sino_ref[0, :, :], g_scratch[:, :], preferred_element_type=jnp.float32
        )
        zero = jnp.zeros_like(contrib)
        out_ref[:, r, :] += jnp.where(is_y, zero, contrib)
        outt_ref[:, r, :] += jnp.where(is_y, contrib, zero)
        return 0

    lax.fori_loop(0, h, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def radon_pallas_fused(
    image: Array,     # (B, N, N) square
    scal: Array,      # (A_sub, 5) traced gather of angle_table_fused()
    n_det: int,
    interpret: bool = False,
) -> Array:
    """Radon transform for a traced angle subset, one kernel pass.

    Same result as :func:`radon_pallas_dynamic` (tested against it) at half
    the kernel work; (B, A_sub, n_det).
    """
    return _fused_fwd_impl(image, scal, n_det, interpret)


def _fused_fwd_impl(image, scal, n_det, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = image.shape
    assert h == w, "fused dynamic projector requires square images"
    a_sub = scal.shape[0]
    h_pad = _ceil_to(h, _SUB)
    w_pad = _ceil_to(w, _LANE)
    t_pad = _ceil_to(n_det, _LANE)
    b_pad, b_tile = _batch_tile(b, h_pad, w_pad, n_blocks=2)
    imgs = jnp.pad(
        image, ((0, b_pad - b), (0, h_pad - h), (0, w_pad - w))
    ).astype(jnp.float32)
    imgs_t = jnp.pad(
        jnp.swapaxes(image, 1, 2), ((0, b_pad - b), (0, h_pad - w), (0, w_pad - h))
    ).astype(jnp.float32)

    kernel = functools.partial(_fwd_kernel_fused, h=h, w_pad=w_pad, t_pad=t_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // b_tile, a_sub),
        in_specs=[
            pl.BlockSpec((b_tile, h_pad, w_pad), lambda bt, a, *_: (bt, 0, 0)),
            pl.BlockSpec((b_tile, h_pad, w_pad), lambda bt, a, *_: (bt, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b_tile, t_pad), lambda bt, a, *_: (a, bt, 0)),
        scratch_shapes=[
            pltpu.VMEM((w_pad, t_pad), jnp.float32),
            pltpu.VMEM((b_tile, t_pad), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((a_sub, b_pad, t_pad), jnp.float32),
        interpret=interpret,
    )(scal, imgs, imgs_t)
    return jnp.transpose(out[:, :b, :n_det], (1, 0, 2))


def _fused_adj_impl(g, scal, h, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, a_sub, n_det = g.shape
    assert h == w, "fused dynamic projector requires square images"
    h_pad = _ceil_to(h, _SUB)
    w_pad = _ceil_to(w, _LANE)
    t_pad = _ceil_to(n_det, _LANE)
    b_pad, b_tile = _batch_tile(b, h_pad, w_pad, n_blocks=2)
    sino_p = jnp.pad(
        jnp.transpose(g, (1, 0, 2)),
        ((0, 0), (0, b_pad - b), (0, t_pad - n_det)),
    ).astype(jnp.float32)

    kernel = functools.partial(_adj_kernel_fused, h=h, w_pad=w_pad, t_pad=t_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // b_tile, a_sub),
        in_specs=[pl.BlockSpec((1, b_tile, t_pad), lambda bt, a, *_: (a, bt, 0))],
        out_specs=[
            pl.BlockSpec((b_tile, h_pad, w_pad), lambda bt, a, *_: (bt, 0, 0)),
            pl.BlockSpec((b_tile, h_pad, w_pad), lambda bt, a, *_: (bt, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((t_pad, w_pad), jnp.float32)],
    )
    out, out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, h_pad, w_pad), jnp.float32),
        ],
        interpret=interpret,
    )(scal, sino_p)
    return out[:b, :h, :w] + jnp.swapaxes(out_t[:b, :w, :h], 1, 2)


def _radon_fused_fwd(image, scal, n_det, interpret):
    return _fused_fwd_impl(image, scal, n_det, interpret), (image.shape, scal)


def _radon_fused_bwd(n_det, interpret, res, g):
    (b, h, w), scal = res
    return (_fused_adj_impl(g, scal, h, w, interpret), jnp.zeros_like(scal))


radon_pallas_fused.defvjp(_radon_fused_fwd, _radon_fused_bwd)
