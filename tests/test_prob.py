"""Oracle tests for ct_pvae_tpu.prob against scipy closed forms.

Covers the distribution set the reference used from TFP (SURVEY.md §2.3):
log-probs vs scipy.stats, sampler moments, analytic KLs vs Monte-Carlo, the
positive_range map, and the simplex bijector round-trip + log-det.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from ct_pvae_tpu.prob import (
    Beta,
    Dirichlet,
    DirichletMixture,
    IteratedSigmoidCentered,
    Normal,
    Poisson,
    TruncatedNormal,
    kl_divergence,
    positive_range,
)
from ct_pvae_tpu.prob.distributions import toy_prior

KEY = jax.random.PRNGKey(0)


def test_normal_logprob_matches_scipy():
    x = np.linspace(-3, 5, 17).astype(np.float32)
    d = Normal(loc=jnp.float32(1.2), scale=jnp.float32(0.7))
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(x)), st.norm(1.2, 0.7).logpdf(x), rtol=1e-4, atol=1e-4
    )


def test_truncated_normal_logprob_matches_scipy():
    loc, scale, low, high = 0.3, 0.8, 0.0, 1e10
    a, b = (low - loc) / scale, (high - loc) / scale
    x = np.linspace(0.01, 3, 13).astype(np.float32)
    d = TruncatedNormal(
        loc=jnp.float32(loc), scale=jnp.float32(scale),
        low=jnp.float32(low), high=jnp.float32(high),
    )
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(x)),
        st.truncnorm(a, b, loc=loc, scale=scale).logpdf(x),
        rtol=1e-4, atol=1e-4,
    )
    assert np.isneginf(float(d.log_prob(jnp.float32(-0.5))))


def test_truncated_normal_sampling_moments_and_gradients():
    loc, scale = -0.5, 1.0  # heavy truncation at 0
    d = TruncatedNormal(jnp.float32(loc), jnp.float32(scale), jnp.float32(0.0), jnp.float32(1e10))
    s = d.sample(KEY, (200_000,))
    assert float(jnp.min(s)) >= 0.0
    a = (0 - loc) / scale
    expect = st.truncnorm(a, np.inf, loc=loc, scale=scale).mean()
    np.testing.assert_allclose(float(jnp.mean(s)), expect, rtol=2e-2)
    np.testing.assert_allclose(float(d.mean()), expect, rtol=1e-4)

    # reparameterized gradient: d/dloc E[x] should be ~ d(analytic mean)/dloc
    def mean_sample(l):
        dd = TruncatedNormal(l, jnp.float32(scale), jnp.float32(0.0), jnp.float32(1e10))
        return jnp.mean(dd.sample(KEY, (100_000,)))

    g = jax.grad(mean_sample)(jnp.float32(loc))
    eps = 1e-3
    fd = (
        st.truncnorm((0 - loc - eps) / scale, np.inf, loc=loc + eps, scale=scale).mean()
        - st.truncnorm((0 - loc + eps) / scale, np.inf, loc=loc - eps, scale=scale).mean()
    ) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=5e-2)


def test_beta_logprob_and_moments():
    a, b = 1.7, 0.6
    x = np.linspace(0.02, 0.98, 11).astype(np.float32)
    d = Beta(jnp.float32(a), jnp.float32(b))
    np.testing.assert_allclose(d.log_prob(jnp.asarray(x)), st.beta(a, b).logpdf(x), rtol=1e-4, atol=1e-4)
    s = d.sample(KEY, (200_000,))
    np.testing.assert_allclose(float(jnp.mean(s)), a / (a + b), rtol=2e-2)


def test_poisson_logprob_matches_scipy():
    rate = 37.5
    k = np.arange(0, 90, dtype=np.float32)
    d = Poisson(jnp.float32(rate))
    # f32 gammaln carries ~1e-5 relative error at |logpmf| ~ 300
    np.testing.assert_allclose(d.log_prob(jnp.asarray(k)), st.poisson(rate).logpmf(k), rtol=1e-3, atol=1e-2)


def test_dirichlet_logprob_matches_scipy():
    conc = np.array([0.5, 1.5, 2.0, 0.9], np.float32)
    x = np.array([0.1, 0.3, 0.4, 0.2], np.float32)
    d = Dirichlet(jnp.asarray(conc))
    np.testing.assert_allclose(float(d.log_prob(jnp.asarray(x))), st.dirichlet(conc).logpdf(x), rtol=1e-4, atol=1e-4)


def test_dirichlet_mixture_logprob_and_sampling():
    mix = toy_prior()
    x = np.array([0.1, 0.3, 0.4, 0.2], np.float32)
    w = [0.3, 0.7]
    c0 = [0.35580334, 0.94963009, 0.60227688, 0.43061459]
    c1 = [0.00390356, 0.44335424, 0.83152378, 0.52733124]
    expect = np.log(
        w[0] * st.dirichlet(c0).pdf(x) + w[1] * st.dirichlet(c1).pdf(x)
    )
    np.testing.assert_allclose(float(mix.log_prob(jnp.asarray(x))), expect, rtol=1e-3)
    s = mix.sample(KEY, (50_000,))
    assert s.shape == (50_000, 4)
    np.testing.assert_allclose(np.asarray(jnp.sum(s, -1)), 1.0, atol=1e-4)
    expect_mean = w[0] * np.array(c0) / np.sum(c0) + w[1] * np.array(c1) / np.sum(c1)
    np.testing.assert_allclose(np.asarray(jnp.mean(s, 0)), expect_mean, atol=5e-3)


@pytest.mark.parametrize("pair", ["normal", "beta"])
def test_analytic_kl_vs_monte_carlo(pair):
    if pair == "normal":
        p = Normal(jnp.float32(0.5), jnp.float32(0.8))
        q = Normal(jnp.float32(0.0), jnp.float32(1.0))
    else:
        p = Beta(jnp.float32(2.0), jnp.float32(3.0))
        q = Beta(jnp.float32(0.5), jnp.float32(0.5))
    kl = float(kl_divergence(p, q))
    s = p.sample(KEY, (400_000,))
    mc = float(jnp.mean(p.log_prob(s) - q.log_prob(s)))
    np.testing.assert_allclose(kl, mc, rtol=2e-2, atol=2e-3)


def test_positive_range_properties():
    x = jnp.linspace(-20, 20, 101)
    y = positive_range(x)
    assert float(jnp.min(y)) > 0
    # linear above 1, exp below; continuous at the knee
    np.testing.assert_allclose(float(positive_range(jnp.float32(5.0))), 5.0)
    lo = float(positive_range(jnp.float32(1.0 - 1e-6)))
    np.testing.assert_allclose(lo, 1.0, atol=1e-4)


def test_simplex_bijector_roundtrip_and_uniform_center():
    x = jax.random.normal(KEY, (64, 3))
    y = IteratedSigmoidCentered.forward(x)
    assert y.shape == (64, 4)
    np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, atol=1e-5)
    x_back = IteratedSigmoidCentered.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-3)
    # centered: zero maps to uniform
    y0 = IteratedSigmoidCentered.forward(jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(y0), 0.25, atol=1e-4)


def test_simplex_bijector_log_det_matches_autodiff():
    x = jnp.asarray([0.3, -0.7, 1.2], jnp.float32)
    jac = jax.jacfwd(lambda v: IteratedSigmoidCentered.forward(v)[:-1])(x)
    _, logdet_auto = np.linalg.slogdet(np.asarray(jac))
    logdet = float(IteratedSigmoidCentered.forward_log_det_jacobian(x))
    np.testing.assert_allclose(logdet, logdet_auto, rtol=1e-5)
