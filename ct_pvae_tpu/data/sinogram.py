"""Sinogram synthesis: images -> projections, using our own projector.

The reference shells out to tomopy's C ray-driven ``project`` per image in a
host loop (images_to_sinograms.py:62-66, helper_functions.py:33-38); the toy
path uses analytic row/column sums (:54-59).  Here the whole dataset is
projected in batched, jit-compiled chunks on the accelerator with the same
differentiable projector used in training — one operator, one geometry.

The toy detector-flip quirk: the reference computes the pi/2 projection as
``np.sum(imgs, axis=2)[::-1]`` — flipping the *batch* axis (a bug masked by
the duplicated toy layout, see tests/test_radon.py).  We simply project with
the real operator; for the reference's toy objects the resulting sinograms
coincide with what its training data contains.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.radon import radon_fast
from . import io
from .foam import generate_foam_images
from .toy import generate_toy_images, toy_theta


def images_to_sinograms(
    images: np.ndarray,
    theta: np.ndarray,
    pad: bool = True,
    batch: int = 64,
) -> np.ndarray:
    """Project a stack of images to sinograms in device-sized chunks.

    Returns (N, A, P) with negatives clamped to zero
    (images_to_sinograms.py:72).
    """
    images = np.asarray(images, np.float32)
    n = images.shape[0]
    proj_fn = jax.jit(lambda x: radon_fast(x, theta, pad=pad))
    outs = []
    for i in range(0, n, batch):
        chunk = images[i : i + batch]
        if chunk.shape[0] < batch:  # keep shapes static for the jit cache
            pad_n = batch - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros((pad_n,) + chunk.shape[1:], np.float32)])
            outs.append(np.asarray(proj_fn(jnp.asarray(chunk)))[: batch - pad_n])
        else:
            outs.append(np.asarray(proj_fn(jnp.asarray(chunk))))
    sinos = np.concatenate(outs, axis=0)
    return np.clip(sinos, 0.0, None)


def make_dataset(
    img_type: str,
    num_train: int,
    save_path: Optional[str] = None,
    num_angles: int = 180,
    n_pixel: int = 128,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """End-to-end dataset creation (foam or toy), honoring the disk contract.

    foam: N_PIXEL^2 phantoms, theta = linspace(0, pi, num_angles), padded
    projections (images_to_sinograms.py:34-37).
    toy: 2x2 discrete objects, theta = [0, pi/2], no padding (:28-31).

    Returns (images, sinograms, theta).
    """
    if img_type == "foam":
        images = generate_foam_images(num_train, n_pixel=n_pixel, seed=seed)
        theta = np.linspace(0, np.pi, num_angles, endpoint=False).astype(np.float32)
        sinos = images_to_sinograms(images, theta, pad=True)
    elif img_type in ("toy", "toy_discrete2"):
        images = generate_toy_images(max(1, num_train // 4), discrete=True)
        theta = toy_theta()
        sinos = images_to_sinograms(images, theta, pad=False, batch=1024)
    else:
        raise ValueError(f"unknown img_type {img_type!r}")

    if save_path is not None:
        io.save_dataset(save_path, sinos, theta, images.shape[1], images.shape[2])
        # ground truth next to the dataset folder, named so that
        # io.load_ground_truth's 'dataset_<name>' -> '<name>_training.npy'
        # convention (reference main_ct_vae.py:566) resolves it — a custom
        # --save-path (e.g. dataset_foam_512) gets its own ground-truth file
        # instead of clobbering the default dataset's
        import os

        norm = os.path.normpath(save_path)
        root = os.path.dirname(norm) or "."
        base = os.path.basename(norm)
        if base.startswith("dataset_"):
            name = base[len("dataset_"):]
        else:
            name = img_type if img_type != "toy" else "toy_discrete2"
        io.save_ground_truth(images, name, root)
    return images, sinos, theta
