"""Toy-posterior MCMC driver (reference bin/toy_mcmc_v2.py as a library call).

Loads the masks/measurements a VAE run produced (the same disk coupling the
reference uses, toy_mcmc_v2.py:54-60), runs HMC/NUTS/SMC over the simplex
posterior with many chains, and writes ``posterior_prob_trace.npy`` plus
per-pixel histogram figures.
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
    print(f"{sampler} done in {(time.time()-t0)/60:.2f} min; diag={ {k: float(np.asarray(v).mean()) for k, v in diag.items() if np.asarray(v).size==1} }")
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
