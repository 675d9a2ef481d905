"""MCMC drivers: toy simplex posterior + image-scale (foam) posteriors.

``run_toy_mcmc`` is the reference bin/toy_mcmc_v2.py as a library call: loads
the masks/measurements a VAE run produced (the same disk coupling the
reference uses, toy_mcmc_v2.py:54-60), runs HMC/NUTS/SMC over the simplex
posterior with many chains, and writes ``posterior_prob_trace.npy`` plus
per-pixel histogram figures.

``run_foam_mcmc`` is the north-star extension the reference lacks: the same
sampler stack over a full H x W per-object posterior (mcmc/image_model.py),
with chains sharded on the ``chains`` mesh axis and posterior moments
accumulated in bounded-memory chunks.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..mcmc import HMCConfig, NUTSConfig, SMCConfig, hmc_sample, nuts_sample, smc_sample
from ..mcmc.toy_model import toy_posterior_sampler, toy_joint_log_prob
from ..parallel.chains import make_chains_mesh, shard_chains
from ..prob.bijectors import IteratedSigmoidCentered
from ..prob.distributions import toy_prior

_EPS = float(np.finfo(np.float32).eps)


def _scalar_diag(diag: dict) -> dict:
    """Scalar-valued summary of a sampler diag dict (skips array/tuple state
    like final_state / inv_mass / the Welford continuation triple)."""
    out = {}
    for k, v in diag.items():
        try:
            a = np.asarray(v, dtype=np.float64)
        except (ValueError, TypeError):
            continue
        if a.size == 1:
            out[k] = float(a)
    return out


def run_toy_mcmc(
    save_path: str,
    number_of_steps: int = 200000,
    burnin: int = 50000,
    example_num: int = 0,
    poisson_noise_multiplier: float = 1e3,
    num_chains: int = 8,
    sampler: str = "hmc",
    theta=None,
    seed: int = 0,
) -> np.ndarray:
    """Returns the simplex-space trace (steps, chains, 4)."""
    if theta is None:
        theta = np.array([0.0, np.pi / 2], np.float32)  # ref toy_mcmc_v2.py:44
    all_masks = np.load(os.path.join(save_path, "all_masks.npy"))
    all_proj = np.load(os.path.join(save_path, "all_proj_samples.npy"))
    mask = all_masks[example_num]
    proj_sample = all_proj[example_num]
    used = mask > _EPS
    theta_used = jnp.asarray(theta[used])
    mask_used = jnp.asarray(mask[used])
    meas = jnp.asarray(proj_sample[used])

    # per-chain steps: the reference runs one chain of `number_of_steps`
    # (toy_mcmc_v2.py:139-148); we split the budget across chains.
    steps = max(number_of_steps // num_chains, 1)
    burn = max(burnin // num_chains, 1)
    key = jax.random.PRNGKey(seed)
    log_prob = toy_posterior_sampler(meas, theta_used, mask_used, poisson_noise_multiplier)
    init = jnp.zeros((num_chains, 3))  # uniform simplex (ref :91-97)

    # Shard the chain axis across every local device (ICI/DCN via the mesh);
    # single-device runs take the mesh=None no-op path.
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 and num_chains % n_dev == 0:
        mesh = make_chains_mesh(n_dev)
        init = shard_chains(mesh, init)

    t0 = time.time()
    if sampler == "hmc":
        cfg = HMCConfig(
            num_results=steps, num_burnin=burn,
            num_leapfrog=5, step_size=6.5e-2, num_adaptation=400,
        )
        samples, diag = hmc_sample(log_prob, init, key, cfg)
    elif sampler == "nuts":
        cfg = NUTSConfig(num_results=steps, num_burnin=burn, step_size=6.5e-2)
        samples, diag = nuts_sample(log_prob, init, key, cfg)
    elif sampler == "smc":
        prior = toy_prior()
        k1, k2 = jax.random.split(key)
        init_particles = IteratedSigmoidCentered.inverse(
            prior.sample(k1, (max(number_of_steps // 100, 512),))
        )
        if n_dev > 1 and init_particles.shape[0] % n_dev == 0:
            init_particles = shard_chains(make_chains_mesh(n_dev), init_particles)

        def log_prior(x):
            o = IteratedSigmoidCentered.forward(x)
            return prior.log_prob(o) + IteratedSigmoidCentered.forward_log_det_jacobian(x)

        def log_lik(x):
            o = IteratedSigmoidCentered.forward(x)
            return toy_joint_log_prob(
                o, meas, theta_used, mask_used, poisson_noise_multiplier
            ) - prior.log_prob(jnp.maximum(o, np.finfo(np.float32).tiny))

        cfg = SMCConfig(num_particles=init_particles.shape[0])
        particles, diag = smc_sample(log_prior, log_lik, init_particles, k2, cfg)
        samples = particles[None]
    else:
        raise ValueError(f"unknown sampler {sampler!r}")

    trace = np.asarray(
        IteratedSigmoidCentered.forward(samples.reshape(-1, 3)).reshape(
            samples.shape[0], -1, 4
        )
    )
    if sampler in ("hmc", "nuts") and trace.shape[0] >= 8:
        from ..mcmc.diagnostics import effective_sample_size, split_rhat

        diag = dict(diag)
        diag["rhat_max"] = float(np.max(split_rhat(trace)))
        diag["ess_min"] = float(np.min(effective_sample_size(trace)))
    print(f"{sampler} done in {(time.time()-t0)/60:.2f} min; diag={_scalar_diag(diag)}")
    np.save(os.path.join(save_path, "posterior_prob_trace.npy"), trace.reshape(-1, 4))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        flat = trace.reshape(-1, 4)
        for pix in range(4):
            plt.figure(figsize=[12.5, 4])
            plt.title(f"MCMC result, pixel {pix}")
            plt.hist(flat[:, pix], bins=25, histtype="stepfilled", density=True)
            plt.savefig(os.path.join(save_path, f"pixel_mcmc_{pix}.png"))
            plt.close()
    except Exception:
        pass
    return trace


def run_foam_mcmc(
    save_path: str,
    number_of_steps: int = 2000,
    burnin: int = 1000,
    example_num: int = 0,
    poisson_noise_multiplier: float = None,
    num_chains: int = 8,
    sampler: str = "nuts",
    prior: str = "tv",
    prior_weight: float = 10.0,
    seed: int = 0,
    chunk: int = 64,
    max_depth: int = 7,
    input_path: str = None,
    output_prefix: str = "mcmc",
    smc_beta0: float = 0.0,
    init_source: str = "classical",
    mass_install: bool = True,
) -> dict:
    """Image-scale posterior sampling for one object of a finished VAE run.

    Loads the run's measurement realization (all_masks / all_proj_samples —
    the exact coupling the toy driver uses, toy_mcmc_v2.py:54-60), builds the
    true-Poisson image posterior (mcmc/image_model.py), warm-starts chains at
    the run's classical init stack, and runs NUTS (chunked, bounded-memory
    moment accumulation) or SMC (tempered from the jittered init cloud).

    Writes ``<prefix>_posterior_mean.npy`` / ``<prefix>_posterior_std.npy``
    ((x, y) images) under ``save_path`` and returns
    {"mean", "std", "diag", "psnr_mcmc", "psnr_init"} — the PSNRs against
    ground truth (when resolvable from the dataset path) for the posterior
    mean and for the classical init it started from.  For the nuts/hmc
    samplers the returned diag also carries convergence evidence over the
    retained draws (mcmc/diagnostics.py): ``rhat_max``/``rhat_med`` split
    R-hat and ``ess_min``/``ess_med`` per-pixel effective sample sizes —
    the numbers that decide whether the mean/std maps are posterior
    estimates or local refinements.
    """
    from ..config import Config
    from ..data import io as data_io
    from ..mcmc import NUTSConfig, SMCConfig, nuts_sample, smc_sample, HMCConfig, hmc_sample
    from ..mcmc.diagnostics import effective_sample_size, split_rhat
    from ..mcmc.image_model import (
        estimate_curvature_diag,
        init_chains_from_recon,
        make_image_log_prob,
        softplus_forward,
    )
    from .metrics import compare

    if number_of_steps < 1:
        raise ValueError(f"number_of_steps must be >= 1, got {number_of_steps}")

    cfg = Config.load(os.path.join(save_path, "config.json"))
    if input_path is None:
        input_path = cfg.input_path
    if poisson_noise_multiplier is None:
        poisson_noise_multiplier = cfg.poisson_noise_multiplier
    _, theta, _ = data_io.load_dataset(input_path)

    all_masks = np.load(os.path.join(save_path, "all_masks.npy"))
    all_proj = np.load(os.path.join(save_path, "all_proj_samples.npy"))
    init_stack = np.load(os.path.join(save_path, "all_input_encode.npy"))
    mask = all_masks[example_num]
    used = mask > _EPS
    theta_used = np.asarray(theta)[used]
    mask_used = jnp.asarray(mask[used])
    meas = jnp.asarray(all_proj[example_num][used])
    if init_source == "vae":
        # warm-start from the trained amortized posterior mean (Next #7's
        # beta~1 SMC refinement wants the best available init cloud)
        init_recon = np.squeeze(
            np.load(os.path.join(save_path, "reconstruction_mean.npy"))[example_num]
        ).astype(np.float32)
    else:
        init_recon = init_stack[example_num, :, :, 0]  # first algorithm channel
    x_size, y_size = init_recon.shape

    if init_source != "vae":
        # Measurement-consistent amplitude correction (round 5).  The
        # preprocessing stores the classical-init channels in the encoder's
        # normalized convention — ~10x BELOW true image scale (e.g. the r4
        # paper run's gridrec channel peaks at 0.14 on [0,1] ground truth).
        # The VAE is scale-free about its inputs, but a raw warm start puts
        # every chain far outside the posterior's basin: the pnm~1e4 Poisson
        # gradient at a 10x-too-dim image is enormous, dual averaging
        # collapses the step to ~1e-6, and 768 draws "refine locally" (the
        # r4 caveat).  The Poisson-ML rescale for a pure amplitude a on
        # rates a*r is a* = sum(counts)/sum(r) — measurements only, no
        # ground truth.
        from ..ops.radon import radon as _radon

        pos_init = jnp.clip(jnp.asarray(init_recon, jnp.float32), 0.0, None)
        pred = _radon(pos_init[None], jnp.asarray(theta_used), pad=True,
                      n_det=int(meas.shape[-1]))[0] * mask_used[:, None]
        denom = float(jnp.sum(pred))
        amp = float(jnp.sum(meas)) / denom if denom > 1e-8 else 1.0
        amp = float(np.clip(amp, 1e-3, 1e3))
        init_recon = np.asarray(pos_init) * amp

    # use_pallas=False: the Pallas projector's MXU dots round inputs to
    # bf16 (preferred_element_type only sets the f32 accumulator).  At
    # pnm~1e4 the resulting ~4e-3 relative rate error perturbs the deviance
    # log-likelihood by O(10-100) — far beyond the O(1) Hamiltonian-energy
    # resolution the MH accept test needs — so on TPU the step size
    # collapses exactly as the f32-cancellation bug did (healthy on CPU,
    # where Pallas interpret mode computes exact f32).  The XLA gather
    # projector is matmul-free (exact f32 on the VPU); sampling throughput
    # is gradient-bound either way at MCMC's one-image working set.
    log_prob = make_image_log_prob(
        meas, theta_used, mask_used, poisson_noise_multiplier,
        x_size, y_size, prior=prior, prior_weight=prior_weight,
        use_pallas=False,
    )

    key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    init = init_chains_from_recon(init_recon, num_chains, k_init)

    n_dev = len(jax.devices())
    if n_dev > 1 and num_chains % n_dev == 0:
        init = shard_chains(make_chains_mesh(n_dev), init)

    t0 = time.time()
    dim = x_size * y_size
    # Every device call below is bounded to ~one chunk of outer steps.  A
    # sample_chain-style single execution (minutes of device time in ONE XLA
    # program) is exactly the shape long-running remote runtimes kill; the
    # continuation inputs (state / step size / inv mass / beta) make chunked
    # dispatch cost one host round trip per chunk and nothing else, and the
    # posterior moments accumulate on device between readbacks.
    if sampler == "smc":
        from ..mcmc.image_model import image_log_prior, softplus_log_det_jacobian

        def log_prior_fn(x):
            o = softplus_forward(x).reshape(x_size, y_size)
            return image_log_prior(o, prior, prior_weight) + softplus_log_det_jacobian(x)

        def log_lik_fn(x):
            return log_prob(x) - log_prior_fn(x)

        total_stages = max(number_of_steps // SMCConfig().mutation_steps, 8)
        stage_chunk = max(4, chunk // 8)
        scfg = SMCConfig(
            num_particles=num_chains, num_stages=stage_chunk, step_size=1e-2
        )
        particles = init
        # smc_beta0 > 0 warm-starts the tempering ladder (Next #7: a beta~1
        # refinement schedule from a good init cloud — cold tempering from
        # beta=0 is impractical at image dimension, BENCH.md caveat (b))
        beta = jnp.float32(smc_beta0)
        ss = jnp.float32(scfg.step_size)
        lev = jnp.float32(0.0)
        diag = {}
        done = 0
        while done < total_stages:
            k_run, kc = jax.random.split(k_run)
            particles, diag = smc_sample(
                log_prior_fn, log_lik_fn, particles, kc, scfg,
                beta0=beta, step_size0=ss, log_evidence0=lev,
            )
            beta = diag["beta"]
            ss = diag["final_step_size"]
            lev = diag["log_evidence"]
            done += stage_chunk
        o = softplus_forward(particles).reshape(num_chains, x_size, y_size)
        mean = jnp.mean(o, axis=0)
        std = jnp.std(o, axis=0)
        draws = num_chains
    else:
        diag = {}
        inv_mass = None
        if sampler == "nuts":
            # Preconditioned metric (r4 VERDICT Next #1): identity-metric
            # NUTS on this target adapts to ~1e-6 step sizes because the
            # per-pixel curvature of the pnm~1e4 Poisson + Charbonnier-TV
            # posterior spans orders of magnitude.  inv_mass starts at
            # 1/curvature (physics-informed Gauss-Newton + prior Hessian
            # diagonal at the init point, mcmc/image_model.py), then Welford
            # refines it ACROSS warmup chunks — the (count, mean, m2)
            # continuation inputs make the variance window span chunked
            # device calls exactly like step_size0/inv_mass0 already do —
            # with the pooled estimate installed at 80% of burnin and dual
            # averaging re-tuning the step size afterwards.
            k_run, k_curv = jax.random.split(k_run)
            curv = estimate_curvature_diag(
                jnp.mean(init, axis=0), meas, theta_used, mask_used,
                poisson_noise_multiplier, x_size, y_size,
                prior=prior, prior_weight=prior_weight, key=k_curv,
                use_pallas=False,  # same exact-f32 routing as log_prob above
            )
            inv_mass = 1.0 / curv
            warm_cfg = NUTSConfig(
                num_results=0, num_burnin=chunk, step_size=1e-2,
                max_depth=max_depth, adapt_mass=False,
            )
            accum_cfg = NUTSConfig(
                num_results=0, num_burnin=chunk, step_size=1e-2,
                max_depth=max_depth, adapt_mass=True,
                welford_window=(0.0, 1.0), install_mass=False,
            )
            cont_cfg = NUTSConfig(
                num_results=chunk, num_burnin=0, step_size=1e-2,
                max_depth=max_depth, adapt_step_size=False, adapt_mass=False,
            )

            state = init
            step_size = None
            da = None  # dual-averaging continuation (nuts.py da0)
            welford = (
                jnp.zeros((), jnp.float32),
                jnp.zeros((dim,), jnp.float32),
                jnp.zeros((dim,), jnp.float32),
            )
            n_chunks = (burnin + chunk - 1) // chunk  # 0 => no warmup (pure
            # refinement from the warm start, e.g. init_source="vae")
            accum_from = int(0.3 * n_chunks)
            install_at = (
                max(int(0.8 * n_chunks), accum_from + 1)
                if (n_chunks >= 3 and mass_install) else None
            )
            for ci in range(n_chunks):
                k_run, kc = jax.random.split(k_run)
                accumulating = ci >= accum_from and (
                    install_at is None or ci < install_at
                )
                if accumulating:
                    _, d = nuts_sample(
                        log_prob, state, kc, accum_cfg,
                        inv_mass0=inv_mass, step_size0=step_size,
                        welford0=welford, da0=da,
                    )
                    welford = d["welford"]
                else:
                    _, d = nuts_sample(
                        log_prob, state, kc, warm_cfg,
                        inv_mass0=inv_mass, step_size0=step_size, da0=da,
                    )
                state, step_size = d["final_state"], d["final_step_size"]
                da = d["da"]
                if install_at is not None and ci + 1 == install_at:
                    # host-side install: pooled chain variance shrunk toward
                    # the physics-informed metric (Stan's regularized window
                    # estimate with 1/curvature in place of the unit scale)
                    n = float(np.asarray(welford[0]))
                    if n >= 8:
                        var = np.asarray(welford[2]) / max(n - 1.0, 1.0)
                        shrink = n / (n + 5.0)
                        inv_mass = jnp.asarray(
                            np.maximum(
                                shrink * var + (1.0 - shrink) * np.asarray(inv_mass),
                                1e-12,
                            ),
                            jnp.float32,
                        )
                        da = None  # new metric: restart step-size adaptation

            def draw_chunk(st, k, ss):
                return nuts_sample(
                    log_prob, st, k, cont_cfg, inv_mass0=inv_mass, step_size0=ss
                )

        else:  # hmc (identity metric; kept for A/Bs against nuts)
            warm_hcfg = HMCConfig(
                num_results=1, num_burnin=chunk - 1, num_leapfrog=5,
                step_size=1e-3, num_adaptation=chunk,
            )
            cont_hcfg = HMCConfig(
                num_results=chunk, num_burnin=0, num_leapfrog=5,
                step_size=1e-3, num_adaptation=0,
            )
            state = init
            step_size = None
            burned = 0
            while burned < burnin:
                k_run, kc = jax.random.split(k_run)
                _, d = hmc_sample(log_prob, state, kc, warm_hcfg, step_size0=step_size)
                state, step_size = d["final_state"], d["final_step_size_per_chain"]
                burned += chunk

            def draw_chunk(st, k, ss):
                return hmc_sample(log_prob, st, k, cont_hcfg, step_size0=ss)

        s1 = jnp.zeros((dim,), jnp.float32)
        s2 = jnp.zeros((dim,), jnp.float32)
        cnt = 0
        remaining = number_of_steps
        # retained constrained draws for convergence diagnostics; when the
        # full (T, C, D) trace would exceed the host budget, a fixed random
        # pixel subset is scored instead (recorded in <prefix>_diag_dims.npy)
        kept = []
        keep_dims = None
        if number_of_steps * num_chains * dim * 4 > 1.5e9:
            n_keep = min(dim, max(int(1.5e9 // (number_of_steps * num_chains * 4)), 1024))
            keep_dims = np.sort(
                np.random.default_rng(0).choice(dim, size=n_keep, replace=False)
            )
            keep_dims_j = jnp.asarray(keep_dims)
        while remaining > 0:
            k_run, kc = jax.random.split(k_run)
            samples, diag = draw_chunk(state, kc, step_size)
            o = softplus_forward(samples)
            take = min(remaining, o.shape[0])
            o = o[:take]
            cnt += take * o.shape[1]
            s1 = s1 + jnp.sum(o, axis=(0, 1))
            s2 = s2 + jnp.sum(o * o, axis=(0, 1))
            kept.append(np.asarray(o if keep_dims is None else o[:, :, keep_dims_j]))
            state = diag["final_state"]
            remaining -= take
        mean = (s1 / cnt).reshape(x_size, y_size)
        var = jnp.maximum(s2 / cnt - (s1 / cnt) ** 2, 0.0)
        std = jnp.sqrt(var).reshape(x_size, y_size)
        draws = cnt

        trace = np.concatenate(kept, axis=0)          # (T, C, D or n_keep)
        rhat = split_rhat(trace)
        ess = effective_sample_size(trace)
        diag = dict(diag)
        diag["rhat_max"] = float(np.max(rhat))
        diag["rhat_med"] = float(np.median(rhat))
        diag["ess_min"] = float(np.min(ess))
        diag["ess_med"] = float(np.median(ess))
        np.save(os.path.join(save_path, f"{output_prefix}_rhat.npy"), rhat)
        np.save(os.path.join(save_path, f"{output_prefix}_ess.npy"), ess)
        if keep_dims is not None:
            np.save(os.path.join(save_path, f"{output_prefix}_diag_dims.npy"), keep_dims)
        if inv_mass is not None:
            diag["inv_mass_spread"] = float(
                np.log10(np.max(np.asarray(inv_mass)) / np.min(np.asarray(inv_mass)))
            )
    mean = np.asarray(mean)
    std = np.asarray(std)
    dt = time.time() - t0
    dstr = _scalar_diag(diag)
    print(
        f"foam {sampler} ({x_size}x{y_size}, {num_chains} chains): "
        f"{draws} draws in {dt:.1f} s ({draws / dt:.2f} draws/s); diag={dstr}"
    )

    np.save(os.path.join(save_path, f"{output_prefix}_posterior_mean.npy"), mean)
    np.save(os.path.join(save_path, f"{output_prefix}_posterior_std.npy"), std)

    out = {"mean": mean, "std": std, "diag": dstr, "seconds": dt, "draws": int(draws)}
    try:
        gt = data_io.load_ground_truth(input_path)[example_num]
        gt = np.asarray(gt, np.float32)
        if gt.shape == mean.shape:
            _, _, p_mcmc = compare(gt, np.clip(mean, 0.0, 1.0))
            _, _, p_init = compare(gt, np.clip(init_recon, 0.0, 1.0))
            out["psnr_mcmc"] = p_mcmc
            out["psnr_init"] = p_init
            print(f"posterior-mean PSNR {p_mcmc:.2f} dB vs classical-init {p_init:.2f} dB")
    except (FileNotFoundError, OSError):
        pass
    return out
