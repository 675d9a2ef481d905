"""Statistical oracle tests for HMC / NUTS / SMC.

The reference's correctness argument is statistical: the VAE/MCMC posterior
must match the analytic toy posterior (SURVEY.md §4).  Here each sampler is
validated on closed-form targets within Monte-Carlo error, plus the toy
2x2 Poisson posterior pipeline end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_pvae_tpu.mcmc import (
    HMCConfig,
    NUTSConfig,
    SMCConfig,
    hmc_sample,
    nuts_sample,
    smc_sample,
)
from ct_pvae_tpu.mcmc.toy_model import toy_posterior_sampler
from ct_pvae_tpu.ops.radon import radon
from ct_pvae_tpu.prob.bijectors import IteratedSigmoidCentered

KEY = jax.random.PRNGKey(0)


def _correlated_gaussian_logprob(z):
    # 2-D Gaussian, mean (1, -0.5), cov [[1, .6], [.6, .8]]
    mean = jnp.array([1.0, -0.5])
    cov = jnp.array([[1.0, 0.6], [0.6, 0.8]])
    prec = jnp.linalg.inv(cov)
    d = z - mean
    return -0.5 * d @ prec @ d


def test_hmc_gaussian_moments():
    init = jax.random.normal(KEY, (32, 2))
    cfg = HMCConfig(num_results=1500, num_burnin=500, num_leapfrog=8, step_size=0.3)
    samples, diag = hmc_sample(_correlated_gaussian_logprob, init, KEY, cfg)
    flat = np.asarray(samples).reshape(-1, 2)
    assert 0.4 < float(diag["accept_rate"]) <= 1.0
    np.testing.assert_allclose(flat.mean(0), [1.0, -0.5], atol=0.08)
    np.testing.assert_allclose(np.cov(flat.T), [[1.0, 0.6], [0.6, 0.8]], atol=0.15)


def test_nuts_gaussian_moments():
    init = jax.random.normal(KEY, (16, 2))
    cfg = NUTSConfig(num_results=1000, num_burnin=500, step_size=0.2, max_depth=6)
    samples, diag = nuts_sample(_correlated_gaussian_logprob, init, KEY, cfg)
    flat = np.asarray(samples).reshape(-1, 2)
    assert 0.5 < float(diag["accept_rate"]) <= 1.0
    np.testing.assert_allclose(flat.mean(0), [1.0, -0.5], atol=0.1)
    np.testing.assert_allclose(np.cov(flat.T), [[1.0, 0.6], [0.6, 0.8]], atol=0.2)


def test_smc_gaussian_posterior():
    # prior N(0, 2^2 I), likelihood N(z | obs, 1) -> posterior analytic
    obs = jnp.array([1.2, -0.4])
    prior_var, lik_var = 4.0, 1.0
    post_var = 1.0 / (1.0 / prior_var + 1.0 / lik_var)
    post_mean = post_var * (obs / lik_var)

    log_prior = lambda z: -0.5 * jnp.sum(z * z) / prior_var
    log_lik = lambda z: -0.5 * jnp.sum((z - obs) ** 2) / lik_var

    init = 2.0 * jax.random.normal(KEY, (2048, 2))
    cfg = SMCConfig(num_particles=2048, num_stages=15, mutation_steps=5, step_size=0.5)
    particles, diag = smc_sample(log_prior, log_lik, init, KEY, cfg)
    assert float(diag["beta"]) == pytest.approx(1.0, abs=1e-4)
    p = np.asarray(particles)
    np.testing.assert_allclose(p.mean(0), np.asarray(post_mean), atol=0.12)
    np.testing.assert_allclose(p.var(0), post_var, rtol=0.3)


def test_toy_posterior_hmc_pipeline():
    """End-to-end: toy object, Poisson measurement, HMC + NUTS over the simplex.

    Note the 2-view 2x2 system has a one-dimensional null space
    (delta*[-1,+1,+1,-1] preserves both projections), so the posterior is NOT
    centered at the true object along that direction — the Dirichlet-mixture
    prior (boundary-attracting, conc_0 ~ 0.004) sets it.  The sound oracles
    are: (a) posterior samples reproduce the measurements within noise, and
    (b) two independent samplers (HMC, NUTS) agree on the posterior mean.
    """
    true_obj = jnp.asarray(np.array([[1, 2], [3, 4]], np.float32) / 10.0)
    theta = jnp.asarray([0.0, np.pi / 2], jnp.float32)
    pnm = 1e4
    sino = radon(true_obj, theta, pad=False)
    mask = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(3)
    meas = jax.random.poisson(key, sino * mask[:, None] * pnm).astype(jnp.float32) / pnm

    log_prob = toy_posterior_sampler(meas, theta, mask, pnm)
    init = jnp.zeros((8, 3))
    cfg = HMCConfig(num_results=1500, num_burnin=800, num_leapfrog=5, step_size=6.5e-2)
    samples, diag = hmc_sample(log_prob, init, jax.random.PRNGKey(4), cfg)
    simplex = IteratedSigmoidCentered.forward(samples.reshape(-1, 3))
    assert float(diag["accept_rate"]) > 0.5

    # (a) measurement consistency: mean projected sample == measurement
    proj_mean = np.asarray(
        radon(jnp.mean(simplex, axis=0).reshape(2, 2), theta, pad=False)
    )
    np.testing.assert_allclose(proj_mean, np.asarray(meas), atol=0.02)

    # (b) cross-sampler agreement on the posterior mean
    ncfg = NUTSConfig(num_results=800, num_burnin=500, step_size=6.5e-2, max_depth=6)
    nsamples, ndiag = nuts_sample(log_prob, init, jax.random.PRNGKey(5), ncfg)
    nuts_mean = np.asarray(
        IteratedSigmoidCentered.forward(nsamples.reshape(-1, 3))
    ).mean(0)
    hmc_mean = np.asarray(simplex).mean(0)
    np.testing.assert_allclose(hmc_mean, nuts_mean, atol=0.03)
