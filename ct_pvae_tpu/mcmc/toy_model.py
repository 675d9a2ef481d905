"""Toy 2x2 posterior model — the exact-posterior MCMC baseline workload.

Re-design of reference ctvae/toy_mcmc_v2_functions.py:30-98 and the driver
bin/toy_mcmc_v2.py: a Dirichlet-mixture prior over the 4-simplex composed with
a true-Poisson measurement likelihood through the differentiable projector.
The HMC/NUTS samplers run in unconstrained R^3 via IteratedSigmoidCentered.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.radon import radon
from ..prob.bijectors import IteratedSigmoidCentered
from ..prob.distributions import Poisson, toy_prior

Array = jnp.ndarray
_TINY = float(np.finfo(np.float32).tiny)


def toy_joint_log_prob(
    o_flat: Array,               # (4,) point on the simplex (flattened 2x2 object)
    measurements: Array,         # (A_used, P) masked, dose-normalized measurements
    theta_used: Array,           # (A_used,)
    mask_used: Array,            # (A_used,)
    poisson_noise_multiplier: float,
    n_pixel: int = 2,
) -> Array:
    """log P(O) + log P(M | O) (reference toy_mcmc_v2_functions.py:66-98)."""
    o = jnp.maximum(o_flat, _TINY)
    prior = toy_prior()
    o_img = o.reshape(n_pixel, n_pixel)
    proj = radon(o_img, theta_used, pad=False)           # (A_used, P)
    proj_masked = proj * mask_used[:, None]
    lik = Poisson(proj_masked * poisson_noise_multiplier)
    return prior.log_prob(o) + jnp.sum(lik.log_prob(measurements * poisson_noise_multiplier))


def toy_posterior_sampler(
    measurements: Array,
    theta_used: Array,
    mask_used: Array,
    poisson_noise_multiplier: float = 1e3,
) -> Callable[[Array], Array]:
    """Unconstrained-space log-prob for HMC/NUTS over the toy posterior."""
    bij = IteratedSigmoidCentered

    def log_prob(x: Array) -> Array:          # x: (3,) unconstrained
        o = bij.forward(x)
        return toy_joint_log_prob(
            o, measurements, theta_used, mask_used, poisson_noise_multiplier
        ) + bij.forward_log_det_jacobian(x)

    return log_prob


def analytic_discrete_posterior(
    proj_sample: Array,          # (A, P) the noisy masked measurement
    mask: Array,                 # (A,)
    sinogram_0: Array,           # (A, P) clean sinogram of object 0
    sinogram_1: Array,           # (A, P) clean sinogram of object 1
    poisson_noise_multiplier: float,
) -> Tuple[Array, Array]:
    """Exact two-object posterior P(O_i | M) for the discrete toy dataset.

    The reference computes h_i = L_i / (L_0 + L_1) from *log*-likelihoods with
    hard-coded object indices compensating its toy-data batch-flip quirk
    (main_ct_vae.py:689-705; SURVEY.md §7).  Here: proper Bayes with equal
    priors in probability space, P(O_i|M) = softmax(log L_i), and the object
    sinograms are passed explicitly.
    """
    def loglik(sino):
        masked = sino * mask[:, None]
        return jnp.sum(
            Poisson(masked * poisson_noise_multiplier).log_prob(
                proj_sample * poisson_noise_multiplier
            )
        )

    l0 = loglik(sinogram_0)
    l1 = loglik(sinogram_1)
    post = jax.nn.softmax(jnp.stack([l0, l1]))
    return post[0], post[1]
