"""Classical-reconstruction encoder inputs (the "iradon_all" stage).

The reference runs tomopy's C kernels over the whole dataset at setup
(helper_functions.py:477-529): for each algorithm in ``--algorithms`` it
reconstructs the mask-unnormalized sparse sinograms, crops, and appends one
extra channel — an unfiltered FBP of the mask itself (:514-516).  Here every
algorithm is a jit-compiled JAX op from ct_pvae_tpu.ops running batched on the
accelerator:

  gridrec         -> FBP with ramp filter (the stand-in every published run
                     artifact in this repo was trained/scored with)
  gridrec_fourier -> true FFT-regridding gridrec (ops/gridrec.py: Kaiser-
                     Bessel gridding, Voronoi angle weights, deapodized ifft2)
  fbp             -> FBP with shepp-logan filter (tomopy's fbp default)
  sirt            -> lax.scan SIRT
  tv              -> Chambolle-Pock TV
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fbp import fbp
from ..ops.sirt import sirt
from ..ops.tv import tv_reconstruct
from ..parallel.distributed import is_primary

_EPS = float(np.finfo(np.float32).eps)


def crop_center(img: np.ndarray, final_x: int, final_y: int):
    """Center crop of trailing two dims (reference helper_functions.py:420-430)."""
    x, y = img.shape[-2], img.shape[-1]
    rx, ry = final_x % 2, final_y % 2
    return img[
        ...,
        x // 2 - final_x // 2 : x // 2 + final_x // 2 + rx,
        y // 2 - final_y // 2 : y // 2 + final_y // 2 + ry,
    ]


def _recon(algorithm: str, sino, theta, size: int, fwd=None, adj=None):
    if algorithm == "gridrec":
        return fbp(sino, theta, size, size, "ramp")
    if algorithm == "gridrec_fourier":
        # The actual regridding algorithm class tomopy's C gridrec belongs to
        # (Kaiser-Bessel gridding + deapodized ifft2, ops/gridrec.py): +2.5 dB
        # over pixel-driven FBP on full sinograms (results/fidelity/FIDELITY.md
        # §3).  Kept under its own name: 'gridrec' stays the ramp-FBP all
        # published run artifacts were scored/trained with.
        from ..ops.gridrec import gridrec

        return gridrec(sino, theta, size, size, "ramp")
    if algorithm == "fbp":
        return fbp(sino, theta, size, size, "shepp-logan")
    if algorithm == "sirt":
        if fwd is not None:
            from ..ops.sirt import sirt_with_ops

            return sirt_with_ops(sino, fwd, adj, size, size, num_iter=30)
        return sirt(sino, theta, size, size, num_iter=30)
    if algorithm == "tv":
        if fwd is not None:
            from ..ops.tv import tv_with_ops

            return tv_with_ops(sino, fwd, adj, size, size, num_iter=60)
        return tv_reconstruct(sino, theta, size, size, num_iter=60)
    raise ValueError(f"unknown algorithm {algorithm!r}")


def classical_recon_stack(
    all_proj_samples: np.ndarray,
    all_masks: np.ndarray,
    theta: np.ndarray,
    algorithms: List[str],
    x_size: int,
    y_size: int,
    save_path: Optional[str] = None,
    train: bool = True,
    batch: int = 32,
    reuse_cache: bool = False,
    cheap_init: bool = False,
) -> np.ndarray:
    """Build the (N, x, y, num_algorithms+1) encoder-input stack.

    Mirrors iradon_all: measurements are un-normalized by the mask where the
    mask is nonzero (helper_functions.py:494-499), each algorithm reconstructs
    the full-angle sinogram (zeros at unmeasured angles), and the final channel
    is the unfiltered backprojection of the mask itself (:514-516).  Cached to
    ``all_input_encode.npy`` (:525-527).  ``reuse_cache`` reloads a matching
    cache even in train mode (shape-checked against the request).

    ``cheap_init`` (serving, config.py): each iterative algorithm (sirt/tv)
    is computed as the one-shot ramp-FBP instead — same channel count and
    order, ~100x fewer projector applications per batch.
    """
    if cheap_init:
        algorithms = ["gridrec" if a in ("sirt", "tv") else a for a in algorithms]
    # the cheap stack has the SAME shape as the full one by design, so it
    # needs its own cache file — a shape-checked reuse of all_input_encode
    # would silently serve the wrong stack (and a cheap run must never
    # overwrite the full stack other consumers read, e.g. run_foam_mcmc's
    # chain init)
    cache_name = "all_input_encode_cheap.npy" if cheap_init else "all_input_encode.npy"
    if save_path is not None:
        cache = os.path.join(save_path, cache_name)
        if not train:
            return np.load(cache)
        if reuse_cache and os.path.exists(cache):
            stack = np.load(cache)
            want = (len(all_proj_samples), x_size, y_size, len(algorithms) + 1)
            if stack.shape == want:
                return stack

    proj = np.asarray(all_proj_samples, np.float32)
    masks = np.asarray(all_masks, np.float32)
    theta_j = jnp.asarray(theta, jnp.float32)
    n, a, p = proj.shape

    mask_expand = np.repeat(masks[:, :, None], p, axis=-1)
    unnorm = np.where(mask_expand > _EPS, proj / np.where(mask_expand > _EPS, mask_expand, 1.0), proj)

    size = p  # reconstruct at detector resolution, then crop (like tomopy)

    # Bound per-dispatch device work: the batch was tuned for the 184-pixel
    # foam geometry; at stretch scale (728-pixel detector, 512^2 recon) a
    # 32-image FBP/SIRT/TV batch is one enormous XLA execution — the shape
    # that long-running remote runtimes kill (BENCH.md image-MCMC note).
    # Scale the batch with detector area so each call stays comparable.
    batch = max(1, min(batch, int(batch * (184.0 / size) ** 2)))

    # SIRT (30) + TV (60) fwd+adj applications dominate this stage.  Angles
    # are concrete here, so on TPU route them through the Pallas MXU kernel
    # pair (exact-transpose adjoint) instead of the XLA gather projector —
    # ~8x per application (BENCH.md).  FBP stays on the pixel-driven
    # backprojector (one application; its interpolation semantics set the
    # encoder-input look the quality runs were tuned on).
    fwd_p = adj_p = None
    if jax.default_backend() == "tpu" and {"sirt", "tv"} & set(algorithms):
        from ..ops.pallas_radon import backproject_pallas, radon_pallas

        theta_t = tuple(float(t) for t in np.asarray(theta))

        def fwd_p(img):
            return radon_pallas(img.astype(jnp.float32), theta_t, size)

        def adj_p(sino):
            return backproject_pallas(sino.astype(jnp.float32), theta_t, size, size)

    @jax.jit
    def recon_batch(sino_b, mask_b):
        chans = [_recon(alg, sino_b, theta_j, size, fwd_p, adj_p) for alg in algorithms]
        chans.append(fbp(mask_b, theta_j, size, size, "none"))
        return jnp.stack(chans, axis=-1)  # (B, size, size, C)

    outs = []
    for i in range(0, n, batch):
        sino_b = jnp.asarray(unnorm[i : i + batch])
        mask_b = jnp.asarray(mask_expand[i : i + batch])
        pad_n = 0
        if sino_b.shape[0] < batch:
            pad_n = batch - sino_b.shape[0]
            sino_b = jnp.pad(sino_b, ((0, pad_n), (0, 0), (0, 0)))
            mask_b = jnp.pad(mask_b, ((0, pad_n), (0, 0), (0, 0)))
        out = np.asarray(recon_batch(sino_b, mask_b))
        outs.append(out[: batch - pad_n] if pad_n else out)
    stack = np.concatenate(outs, axis=0)
    stack = crop_center(np.moveaxis(stack, -1, 1), x_size, y_size)  # (N, C, x, y)
    stack = np.moveaxis(stack, 1, -1).astype(np.float32)  # (N, x, y, C)

    if save_path is not None and is_primary():
        # multi-host: host 0 owns the artifact writes (identical elsewhere)
        os.makedirs(save_path, exist_ok=True)
        np.save(os.path.join(save_path, cache_name), stack)
    return stack
