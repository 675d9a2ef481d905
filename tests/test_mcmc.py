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

    # (b) cross-sampler agreement on the posterior mean, at MATCHED metric:
    # the toy prior's Dirichlet concentrations are all < 1, so the posterior
    # has integrable singularities at every simplex face (most of one
    # component's mass sits below o_i < 1e-30).  Mass-adapted NUTS legitimately
    # reaches deeper into those spikes than identity-mass HMC, so agreement is
    # only a valid oracle with adapt_mass off (the reference's identity-mass
    # HMC, toy_mcmc_v2.py:127-134, defines the parity behavior here).
    ncfg = NUTSConfig(
        num_results=800, num_burnin=500, step_size=6.5e-2, max_depth=6,
        adapt_mass=False,
    )
    nsamples, ndiag = nuts_sample(log_prob, init, jax.random.PRNGKey(5), ncfg)
    nuts_mean = np.asarray(
        IteratedSigmoidCentered.forward(nsamples.reshape(-1, 3))
    ).mean(0)
    hmc_mean = np.asarray(simplex).mean(0)
    np.testing.assert_allclose(hmc_mean, nuts_mean, atol=0.03)


def test_hmc_per_chain_adaptation_recovers_distinct_step_sizes():
    """cross_chain_adapt=False must give genuinely per-chain step sizes: two
    well-separated modes with very different scales trap their chains, so the
    narrow-mode chains must adapt to much smaller steps than the wide-mode
    chains (VERDICT round-1 Weak #4)."""
    scale_narrow, scale_wide = 0.05, 5.0

    def log_prob(z):
        # mixture of N(-50, 0.05^2 I) and N(+50, 5^2 I); modes 100 apart so
        # chains never cross during the test
        lp0 = -0.5 * jnp.sum(jnp.square((z + 50.0) / scale_narrow))
        lp1 = -0.5 * jnp.sum(jnp.square((z - 50.0) / scale_wide))
        return jnp.logaddexp(
            lp0 - z.shape[0] * jnp.log(scale_narrow),
            lp1 - z.shape[0] * jnp.log(scale_wide),
        )

    init = jnp.concatenate(
        [jnp.full((4, 2), -50.0), jnp.full((4, 2), 50.0)], axis=0
    )
    cfg = HMCConfig(
        num_results=200, num_burnin=800, num_adaptation=800,
        num_leapfrog=5, step_size=0.05, cross_chain_adapt=False,
    )
    _, diag = hmc_sample(log_prob, init, jax.random.PRNGKey(2), cfg)
    per_chain = np.asarray(diag["final_step_size_per_chain"])
    assert per_chain.shape == (8,)
    narrow = per_chain[:4].mean()
    wide = per_chain[4:].mean()
    # wide-mode chains should take much larger steps
    assert wide / narrow > 5.0, (narrow, wide)

    # with cross-chain averaging, every chain shares one step size
    cfg_x = cfg._replace(cross_chain_adapt=True)
    _, diag_x = hmc_sample(log_prob, init, jax.random.PRNGKey(2), cfg_x)
    shared = np.asarray(diag_x["final_step_size_per_chain"])
    np.testing.assert_allclose(shared, shared[0], rtol=1e-6)


def test_nuts_mass_matrix_improves_ill_conditioned_ess():
    """Welford diagonal mass adaptation on a badly scaled Gaussian: the
    adapted sampler must estimate the wide coordinate accurately and beat the
    identity-mass sampler's ESS there (VERDICT round-1 next-round #5)."""
    from ct_pvae_tpu.mcmc import effective_sample_size

    scales = jnp.array([0.01, 0.1, 1.0, 10.0])

    def log_prob(z):
        return -0.5 * jnp.sum(jnp.square(z / scales))

    init = jax.random.normal(jax.random.PRNGKey(3), (8, 4)) * scales
    base = NUTSConfig(
        num_results=600, num_burnin=600, step_size=0.01, max_depth=8
    )
    s_adapt, d_adapt = nuts_sample(
        log_prob, init, jax.random.PRNGKey(4), base._replace(adapt_mass=True)
    )
    s_plain, _ = nuts_sample(
        log_prob, init, jax.random.PRNGKey(4), base._replace(adapt_mass=False)
    )

    inv_mass = np.asarray(d_adapt["inv_mass"])
    # learned metric must track the true variances (within a factor ~3)
    ratio = inv_mass / np.square(np.asarray(scales))
    assert np.all(ratio > 0.3) and np.all(ratio < 3.0), inv_mass

    ess_adapt = effective_sample_size(np.asarray(s_adapt))
    ess_plain = effective_sample_size(np.asarray(s_plain))
    # the wide coordinate is where identity mass mixes worst
    assert ess_adapt[-1] > 2.0 * ess_plain[-1], (ess_adapt, ess_plain)
    # adapted marginal std accurate on the wide coordinate
    std_wide = np.asarray(s_adapt)[..., -1].std()
    assert abs(std_wide - 10.0) / 10.0 < 0.25, std_wide


def test_diagnostics_ess_and_rhat_on_iid_and_sticky_chains():
    from ct_pvae_tpu.mcmc import effective_sample_size, split_rhat

    rng = np.random.default_rng(0)
    iid = rng.normal(size=(2000, 4, 2))
    ess = effective_sample_size(iid)
    assert np.all(ess > 0.5 * 2000 * 4)  # iid: ESS ~ T*C
    rhat = split_rhat(iid)
    assert np.all(np.abs(rhat - 1.0) < 0.02)

    # strongly autocorrelated AR(1) chain: ESS must collapse
    phi = 0.99
    ar = np.zeros((2000, 4, 1))
    eps = rng.normal(size=(2000, 4, 1))
    for t in range(1, 2000):
        ar[t] = phi * ar[t - 1] + eps[t]
    ess_ar = effective_sample_size(ar)
    assert ess_ar[0] < 0.05 * 2000 * 4

    # chains stuck at different locations: R-hat must flag
    stuck = rng.normal(size=(1000, 4, 1)) * 0.1 + np.arange(4)[None, :, None]
    assert split_rhat(stuck)[0] > 2.0


def test_nuts_welford_continuation_spans_chunks():
    """Round-5 (r4 VERDICT Next #1): the Welford continuation inputs must pool
    posterior variance ACROSS chunked nuts_sample calls — the chunked image
    drivers install the pooled estimate themselves between calls."""
    import jax
    import jax.numpy as jnp
    from ct_pvae_tpu.mcmc import NUTSConfig, nuts_sample

    scales = jnp.asarray([1.0, 0.05])

    def lp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    chains = 8
    chunk = 60
    cfg = NUTSConfig(
        num_results=0, num_burnin=chunk, step_size=0.02, max_depth=6,
        adapt_mass=True, welford_window=(0.0, 1.0), install_mass=False,
    )
    key = jax.random.PRNGKey(0)
    state = jax.random.normal(jax.random.PRNGKey(1), (chains, 2)) * scales[None]
    welford = (jnp.zeros(()), jnp.zeros((2,)), jnp.zeros((2,)))
    ss = None
    n_chunks = 4
    for _ in range(n_chunks):
        key, kc = jax.random.split(key)
        _, d = nuts_sample(lp, state, kc, cfg, step_size0=ss, welford0=welford)
        state, ss, welford = d["final_state"], d["final_step_size"], d["welford"]

    count = float(welford[0])
    assert count == n_chunks * chunk * chains  # every burnin iter accumulated
    var = np.asarray(welford[2]) / (count - 1.0)
    # pooled variance identifies the two scales (order of magnitude is what
    # the metric needs; MC error at this budget is well within 3x)
    assert 1.0 / 3 < var[0] / 1.0 < 3.0, var
    assert 1.0 / 3 < var[1] / 0.05**2 < 3.0, var
    # and install_mass=False really left the metric alone
    assert np.allclose(np.asarray(d["inv_mass"]), 1.0)
