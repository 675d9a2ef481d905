"""Image-scale (foam) posterior sampling — mcmc/image_model.py + driver.

The capstone oracle (round-3 VERDICT Next #1): on a small synthetic phantom
the true-Poisson image posterior's mean must beat the partial-angle FBP the
chains start from.  CPU geometry (16 x 16) routes through the XLA gather
projector; the Pallas path is exercised in interpret mode by
test_pallas_path_matches_gather below and at scale on TPU via
`cli mcmc --model foam` / `bench-samplers --model foam`.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_pvae_tpu.data.recon_init import crop_center
from ct_pvae_tpu.eval.metrics import compare
from ct_pvae_tpu.mcmc import NUTSConfig, nuts_sample
from ct_pvae_tpu.mcmc.image_model import (
    image_log_prior,
    init_chains_from_recon,
    make_image_log_prob,
    softplus_forward,
    softplus_inverse,
)
from ct_pvae_tpu.ops.fbp import fbp
from ct_pvae_tpu.ops.radon import num_proj_pixels, radon

H = 16
PNM = 1e4


def _phantom():
    """Piecewise-constant disk with one void (TV-friendly, foam-like)."""
    c = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    xx, yy = np.meshgrid(c, c, indexing="ij")
    img = (np.hypot(xx, yy) <= 0.9).astype(np.float32)
    img[np.hypot(xx - 0.3, yy + 0.2) <= 0.3] = 0.0
    return img


def _measurement(seed=0, num_angles=12, nsa=6):
    """Masked, dose-normalized, Poisson-noised sinogram (create_masks.py:94-95)."""
    rng = np.random.default_rng(seed)
    gt = _phantom()
    theta = np.linspace(0, np.pi, num_angles, endpoint=False).astype(np.float32)
    n_det = num_proj_pixels(H, H)
    proj = np.asarray(radon(jnp.asarray(gt[None]), jnp.asarray(theta), pad=True))[0]
    mask = np.zeros(num_angles, np.float32)
    mask[:: num_angles // nsa] = 1.0 / nsa          # uniform spacing, 1/nsa dose
    proj_masked = proj * mask[:, None]
    meas = rng.poisson(np.clip(proj_masked, 0, None) * PNM).astype(np.float32) / PNM
    return gt, theta, mask, meas, n_det


def _partial_fbp(meas, mask, theta, n_det):
    """Classical sparse-angle baseline: FBP of the mask-unnormalized sinogram."""
    unnorm = np.where(mask[:, None] > 0, meas / np.maximum(mask[:, None], 1e-9), 0.0)
    rec = np.asarray(fbp(jnp.asarray(unnorm[None]), jnp.asarray(theta), n_det, n_det, "ramp"))[0]
    return np.asarray(crop_center(rec, H, H))


def test_image_logprob_finite_grad():
    gt, theta, mask, meas, n_det = _measurement()
    used = mask > 0
    lp = make_image_log_prob(meas[used], theta[used], mask[used], PNM, H, H)
    x = softplus_inverse(jnp.asarray(gt).reshape(-1) + 0.05)
    v = lp(x)
    g = jax.grad(lp)(x)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    # the true object should be (much) more probable than a flat image
    flat = softplus_inverse(jnp.full((H * H,), float(gt.mean()) + 1e-3))
    assert float(v) > float(lp(flat))


def test_priors_order_images():
    """TV and smoothness priors must prefer the piecewise-constant phantom
    over i.i.d. noise of the same range."""
    gt = jnp.asarray(_phantom())
    noise = jax.random.uniform(jax.random.PRNGKey(0), (H, H))
    for prior in ("tv", "smooth"):
        assert float(image_log_prior(gt, prior, 1.0)) > float(
            image_log_prior(noise, prior, 1.0)
        )
    assert float(image_log_prior(noise, "flat", 1.0)) == 0.0


def test_nuts_posterior_mean_beats_partial_fbp():
    """The north-star oracle: posterior-mean PSNR > classical sparse-angle FBP."""
    gt, theta, mask, meas, n_det = _measurement()
    used = mask > 0
    lp = make_image_log_prob(
        meas[used], theta[used], mask[used], PNM, H, H, prior="tv", prior_weight=10.0
    )
    init_recon = _partial_fbp(meas, mask, theta, n_det)
    _, _, psnr_fbp = compare(gt, np.clip(init_recon, 0, 1))

    init = init_chains_from_recon(jnp.asarray(init_recon), 4, jax.random.PRNGKey(1))
    cfg = NUTSConfig(num_results=150, num_burnin=150, step_size=1e-2, max_depth=6)
    samples, diag = nuts_sample(lp, init, jax.random.PRNGKey(2), cfg)
    post_mean = np.asarray(
        jnp.mean(softplus_forward(samples), axis=(0, 1)).reshape(H, H)
    )
    _, _, psnr_mcmc = compare(gt, np.clip(post_mean, 0, 1))
    assert np.isfinite(psnr_mcmc)
    assert psnr_mcmc > psnr_fbp, f"posterior mean {psnr_mcmc:.2f} dB <= FBP {psnr_fbp:.2f} dB"
    assert float(diag["accept_rate"]) > 0.2


def test_pallas_path_matches_gather():
    """The TPU kernel path (interpret mode here) must score the same posterior
    as the gather projector at a Pallas-eligible geometry."""
    n = 64
    c = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    xx, yy = np.meshgrid(c, c, indexing="ij")
    gt = (np.hypot(xx, yy) <= 0.8).astype(np.float32)
    theta = np.linspace(0, np.pi, 8, endpoint=False).astype(np.float32)
    n_det = num_proj_pixels(n, n)
    proj = np.asarray(radon(jnp.asarray(gt[None]), jnp.asarray(theta), pad=True))[0]
    mask = np.full(theta.shape, 1.0 / len(theta), np.float32)
    meas = proj * mask[:, None]
    kw = dict(
        poisson_noise_multiplier=PNM, x_size=n, y_size=n, prior="tv", prior_weight=1.0
    )
    lp_pallas = make_image_log_prob(
        meas, theta, mask, use_pallas=True, interpret=True, **kw
    )
    lp_gather = make_image_log_prob(meas, theta, mask, use_pallas=False, **kw)
    x = softplus_inverse(jnp.asarray(gt).reshape(-1) + 0.1)
    a, b = float(lp_pallas(x)), float(lp_gather(x))
    # the two projectors are distinct discretizations; the posterior scores
    # must agree to kernel-accuracy (BENCH.md: 0.6% relative on phantoms)
    assert abs(a - b) / abs(b) < 2e-2, (a, b)


def test_run_foam_mcmc_driver(tmp_path):
    """End-to-end driver on a synthetic run dir: artifacts + chunked moments."""
    from ct_pvae_tpu.config import Config
    from ct_pvae_tpu.eval.mcmc_run import run_foam_mcmc

    gt, theta, mask, meas, n_det = _measurement()
    run = tmp_path / "run"
    ds = tmp_path / "dataset_tiny"
    run.mkdir()
    ds.mkdir()
    # dataset contract (for theta) + ground truth next to it
    np.save(ds / "x_train_sinograms.npy", meas[None])
    np.save(
        ds / "dataset_parameters.npy",
        np.array([theta, float(n_det)], object),
        allow_pickle=True,
    )
    np.save(tmp_path / "tiny_training.npy", gt[None])
    # run-dir artifacts (the masks/measurements disk coupling)
    np.save(run / "all_masks.npy", mask[None])
    np.save(run / "all_proj_samples.npy", meas[None])
    init = _partial_fbp(meas, mask, theta, n_det)
    np.save(run / "all_input_encode.npy", init[None, :, :, None])
    Config(
        input_path=str(ds), save_path=str(run), poisson_noise_multiplier=PNM
    ).save(str(run / "config.json"))

    out = run_foam_mcmc(
        str(run), number_of_steps=24, burnin=30, num_chains=8,
        sampler="nuts", chunk=8, max_depth=5, seed=0,
    )
    assert out["mean"].shape == (H, H)
    assert np.isfinite(out["mean"]).all() and (out["std"] >= 0).all()
    assert out["draws"] >= 24 * 8
    assert os.path.exists(run / "mcmc_posterior_mean.npy")
    assert os.path.exists(run / "mcmc_posterior_std.npy")
    assert "psnr_mcmc" in out  # ground truth resolved via the naming contract
    # r5: convergence evidence is part of the driver contract — split R-hat +
    # ESS over the retained draws, and the preconditioned-metric spread
    for k in ("rhat_max", "rhat_med", "ess_min", "ess_med", "inv_mass_spread"):
        assert np.isfinite(out["diag"][k]), (k, out["diag"])
    assert out["diag"]["rhat_max"] >= 1.0 - 1e-6
    assert out["diag"]["ess_min"] > 0
    assert os.path.exists(run / "mcmc_rhat.npy")
    assert os.path.exists(run / "mcmc_ess.npy")


def test_run_foam_mcmc_smc(tmp_path):
    from ct_pvae_tpu.config import Config
    from ct_pvae_tpu.eval.mcmc_run import run_foam_mcmc

    gt, theta, mask, meas, n_det = _measurement()
    run = tmp_path / "run"
    ds = tmp_path / "dataset_tiny"
    run.mkdir()
    ds.mkdir()
    np.save(ds / "x_train_sinograms.npy", meas[None])
    np.save(
        ds / "dataset_parameters.npy",
        np.array([theta, float(n_det)], object),
        allow_pickle=True,
    )
    np.save(run / "all_masks.npy", mask[None])
    np.save(run / "all_proj_samples.npy", meas[None])
    init = _partial_fbp(meas, mask, theta, n_det)
    np.save(run / "all_input_encode.npy", init[None, :, :, None])
    Config(
        input_path=str(ds), save_path=str(run), poisson_noise_multiplier=PNM
    ).save(str(run / "config.json"))

    # 600 steps -> 120 tempering stages; adaptive tempering reaches beta=1
    # in ~68 on this target (the remaining stages refine at the posterior)
    out = run_foam_mcmc(
        str(run), number_of_steps=600, num_chains=16, sampler="smc", seed=0,
        output_prefix="smc",
    )
    assert np.isfinite(out["mean"]).all()
    assert float(out["diag"]["beta"]) == pytest.approx(1.0)
    assert os.path.exists(run / "smc_posterior_mean.npy")


def test_cli_mcmc_foam(tmp_path, monkeypatch):
    """`cli mcmc --model foam` end to end over a synthetic run dir."""
    from ct_pvae_tpu.cli import main
    from ct_pvae_tpu.config import Config

    gt, theta, mask, meas, n_det = _measurement()
    monkeypatch.chdir(tmp_path)
    run = tmp_path / "run"
    ds = tmp_path / "dataset_tiny"
    run.mkdir()
    ds.mkdir()
    np.save(ds / "x_train_sinograms.npy", meas[None])
    np.save(
        ds / "dataset_parameters.npy",
        np.array([theta, float(n_det)], object),
        allow_pickle=True,
    )
    np.save(run / "all_masks.npy", mask[None])
    np.save(run / "all_proj_samples.npy", meas[None])
    init = _partial_fbp(meas, mask, theta, n_det)
    np.save(run / "all_input_encode.npy", init[None, :, :, None])
    Config(
        input_path=str(ds), save_path=str(run), poisson_noise_multiplier=PNM
    ).save(str(run / "config.json"))

    rc = main([
        "mcmc", "--model", "foam", "--save_path", str(run),
        "-s", "16", "-b", "16", "--chains", "4", "--sampler", "nuts",
        "--prior", "smooth", "--prior_weight", "5.0",
    ])
    assert rc == 0
    assert os.path.exists(run / "mcmc_posterior_mean.npy")


def test_estimate_curvature_diag_preconditions_nuts():
    """The physics-informed metric (r4 VERDICT Next #1) must (a) be positive,
    finite, and stable across probe seeds, and (b) let NUTS adapt a much
    larger step size than the identity metric on the same image posterior."""
    from ct_pvae_tpu.mcmc.image_model import estimate_curvature_diag

    gt, theta, mask, meas, n_det = _measurement()
    used = mask > 0
    lp = make_image_log_prob(
        meas[used], theta[used], mask[used], PNM, H, H, prior="tv", prior_weight=10.0
    )
    init_recon = _partial_fbp(meas, mask, theta, n_det)
    init = init_chains_from_recon(jnp.asarray(init_recon), 4, jax.random.PRNGKey(1))
    x0 = jnp.mean(init, axis=0)

    curv = estimate_curvature_diag(
        x0, meas[used], theta[used], mask[used], PNM, H, H,
        prior="tv", prior_weight=10.0, key=jax.random.PRNGKey(3), num_probes=64,
    )
    curv2 = estimate_curvature_diag(
        x0, meas[used], theta[used], mask[used], PNM, H, H,
        prior="tv", prior_weight=10.0, key=jax.random.PRNGKey(4), num_probes=64,
    )
    c1, c2 = np.asarray(curv), np.asarray(curv2)
    assert np.all(np.isfinite(c1)) and np.all(c1 > 0)
    # probe-seed stability: median relative spread bounded
    assert np.median(np.abs(c1 - c2) / (c1 + c2)) < 0.3

    warm = NUTSConfig(num_results=0, num_burnin=100, step_size=1e-2,
                      max_depth=6, adapt_mass=False)
    _, d_id = nuts_sample(lp, init, jax.random.PRNGKey(5), warm)
    _, d_pc = nuts_sample(lp, init, jax.random.PRNGKey(5), warm,
                          inv_mass0=1.0 / curv)
    eps_id = float(d_id["final_step_size"])
    eps_pc = float(d_pc["final_step_size"])
    assert eps_pc > 3.0 * eps_id, (eps_pc, eps_id)
