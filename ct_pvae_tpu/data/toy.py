"""Toy 2x2 discrete dataset (the exact-posterior oracle workload).

Reproduces the reference's layout exactly (scripts/create_toy_images.py:35-41):
two fixed objects, each duplicated, tiled — so the analytic two-object
posterior (main_ct_vae.py:683-705) applies.  The continuous variant samples the
Dirichlet-mixture ``toy_prior``.
"""

from __future__ import annotations

import jax
import numpy as np

from ..prob.distributions import toy_prior

X_TRAIN_0 = np.array([[1, 2], [3, 4]], np.float32) / 10.0
X_TRAIN_1 = np.array([[3, 4], [1, 2]], np.float32) / 10.0


def toy_theta() -> np.ndarray:
    """The toy acquisition angles (images_to_sinograms.py:29)."""
    return np.array([0.0, np.pi / 2], np.float32)


def generate_toy_images(num_tiles: int = 10000, discrete: bool = True, seed: int = 0) -> np.ndarray:
    """Discrete: [x0, x0, x1, x1] tiled ``num_tiles`` times -> (4*num_tiles, 2, 2).

    Continuous: samples from the Dirichlet-mixture prior reshaped to 2x2.
    """
    if discrete:
        x = np.stack([X_TRAIN_0, X_TRAIN_1], axis=0)
        x = np.repeat(x, repeats=2, axis=0)
        return np.tile(x, (num_tiles, 1, 1))
    prior = toy_prior()
    s = prior.sample(jax.random.PRNGKey(seed), (num_tiles,))
    return np.asarray(s).reshape(num_tiles, 2, 2)
