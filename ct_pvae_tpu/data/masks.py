"""Sparse-angle masks + dose-preserving normalization + Poisson measurement noise.

Semantics match reference ctvae/create_masks.py:16-107:

  * toy masks: fixed alternating [1,0]/[0,1] patterns (:37-42)
  * --random: a random ``num_sparse_angles``-subset of angles per example (:51)
  * default: uniform spacing ``ceil(A/nsa)`` starting at index 0 (:55-59)
  * masks are scaled by 1/num_sparse_angles so total dose is constant (:61)
  * measurements: true Poisson, ``Poisson(proj*mask*pnm)/pnm`` (:94-95)
  * real data skips noise (:83-84)

Differences by design: explicit PRNG keys instead of module-import-time
``np.random.seed(0)`` (:14), and the whole batch is noised in one vectorized
draw on the accelerator.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.distributed import is_primary


def make_masks(
    num_examples: int,
    num_angles: int,
    num_sparse_angles: int,
    random: bool = False,
    toy_masks: bool = False,
    seed: int = 0,
) -> np.ndarray:
    """(N, A) float mask array, scaled by 1/num_sparse_angles."""
    if toy_masks:
        if num_angles != 2:
            raise ValueError(
                f"toy_masks requires num_angles == 2 (got {num_angles}); the "
                "patterns are the fixed 2-angle alternation of create_masks.py:37-42"
            )
        base = np.array([[1, 0], [0, 1], [1, 0], [0, 1]], np.float32)
        reps = int(np.ceil(num_examples / 4))
        masks = np.tile(base, (reps, 1))[:num_examples]
        # dose normalization applies to toy masks too (create_masks.py:60-61);
        # the standard toy recipe uses nsa=1 where this is a no-op
        return masks / num_sparse_angles

    rng = np.random.default_rng(seed)
    masks = np.zeros((num_examples, num_angles), np.float32)
    if random:
        for i in range(num_examples):
            idx = rng.permutation(num_angles)[:num_sparse_angles]
            masks[i, idx] = 1.0
    else:
        spacing = int(np.ceil(num_angles / num_sparse_angles))
        idx = (np.arange(num_sparse_angles) * spacing) % num_angles
        masks[:, idx] = 1.0
    return masks / num_sparse_angles


def create_all_masks(
    x_train_sinograms: np.ndarray,
    num_angles: int,
    save_path: Optional[str] = None,
    poisson_noise_multiplier: float = 1e3,
    num_sparse_angles: int = 10,
    random: bool = False,
    real_data: bool = False,
    train: bool = False,
    truncate_dataset: int = 100,
    toy_masks: bool = False,
    seed: int = 0,
    reuse_cache: bool = False,
    noise_model: str = "poisson",
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (or reload) masks and noisy sparse measurements.

    Returns (all_masks (N, A), all_proj_samples (N, A, P)); persists both under
    ``save_path`` per the artifact contract (create_masks.py:72, :103).
    ``reuse_cache`` reloads matching cached artifacts even in train mode (the
    reference always regenerates when training); shape-mismatched caches are
    regenerated.
    """
    sinos = np.asarray(x_train_sinograms[:truncate_dataset], np.float32)
    sinos = np.clip(sinos, 0.0, None)
    n = sinos.shape[0]

    if save_path is not None and (not train or reuse_cache):
        mp = os.path.join(save_path, "all_masks.npy")
        pp = os.path.join(save_path, "all_proj_samples.npy")
        if not train or (os.path.exists(mp) and os.path.exists(pp)):
            all_masks = np.load(mp)
            all_proj_samples = np.load(pp)
            if not reuse_cache or all_proj_samples.shape == sinos.shape:
                return all_masks, all_proj_samples

    all_masks = make_masks(n, num_angles, num_sparse_angles, random, toy_masks, seed)
    proj_masked = sinos * all_masks[:, :, None]

    if real_data:
        all_proj_samples = proj_masked
    elif noise_model == "poisson":
        key = jax.random.PRNGKey(seed)
        rate = jnp.asarray(proj_masked) * poisson_noise_multiplier
        draws = jax.random.poisson(key, rate).astype(jnp.float32)
        all_proj_samples = np.asarray(draws) / poisson_noise_multiplier
    elif noise_model == "gaussian":
        # Gaussian approximation of the Poisson measurement — the library
        # API's alternative noise model (functions_high_level.py:124-127):
        # Normal(proj_masked, sqrt(proj_masked/pnm)), unclipped like the ref.
        key = jax.random.PRNGKey(seed)
        sigma = np.sqrt(proj_masked / poisson_noise_multiplier)
        eps = np.asarray(jax.random.normal(key, proj_masked.shape), np.float32)
        all_proj_samples = proj_masked + sigma * eps
    else:
        raise ValueError(f"unknown noise_model {noise_model!r}")

    if save_path is not None and is_primary():
        # multi-host: host 0 owns the artifact writes; other hosts computed
        # identical arrays from the same seed
        os.makedirs(save_path, exist_ok=True)
        np.save(os.path.join(save_path, "all_masks.npy"), all_masks)
        np.save(os.path.join(save_path, "all_proj_samples.npy"), all_proj_samples)
    return all_masks, all_proj_samples
