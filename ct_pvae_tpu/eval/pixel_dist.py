"""Per-pixel posterior histograms vs the analytic toy posterior.

Reference CT_VAE.pixel_dist (main_ct_vae.py:648-731): tile one toy example,
run the eval forward pass ``num_repeats`` times, draw ``num_samples_1``
reconstructions per output distribution, histogram each pixel, and overlay the
exact two-object posterior.  The repeats axis is embarrassingly parallel —
here it is one jitted scan with all draws on device (and shards across chips
via the data axis when a mesh is present).

The analytic posterior uses proper Bayes (softmax of log-likelihoods) with the
object sinograms computed by our projector — not the reference's ratio of
*log*-likelihoods with hard-coded compensating indices (see
mcmc/toy_model.analytic_discrete_posterior).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..mcmc.toy_model import analytic_discrete_posterior
from ..ops.radon import radon
from ..prob.distributions import TruncatedNormal, Beta


def collect_pixel_samples(
    trainer,
    example_num: int,
    num_repeats: int = 1000,
    num_samples_1: int = 100,
    seed: int = 17,
) -> np.ndarray:
    """(num_repeats * num_samples_1, x*y) posterior draws for one example."""
    cfg = trainer.cfg
    idx = jnp.full((cfg.batch_size,), example_num, dtype=jnp.int32)
    angle_all = jnp.arange(trainer.num_angles, dtype=jnp.int32)

    def one_repeat(key):
        k1, k2 = jax.random.split(key)
        _, _, aux = trainer._eval_step_fn(trainer.state, trainer.data, idx, angle_all, k1)
        loc, scale = aux.recon_params  # (B, x, y, 1)
        if cfg.use_normal:
            dist = TruncatedNormal(loc, scale, jnp.float32(0.0), jnp.float32(1e10))
        else:
            dist = Beta(loc, scale)
        draws = dist.sample(k2, (num_samples_1,))  # (S1, B, x, y, 1)
        return draws[..., 0, :, :, 0].reshape(num_samples_1, -1)  # first batch element

    keys = jax.random.split(jax.random.PRNGKey(seed), num_repeats)
    run = jax.jit(lambda ks: jax.lax.map(one_repeat, ks))
    out = np.asarray(run(keys))  # (R, S1, x*y)
    return out.reshape(-1, out.shape[-1])


def pixel_dist_run(
    cfg: Config,
    trainer=None,
    num_repeats: Optional[int] = None,
    num_samples_1: Optional[int] = None,
) -> None:
    from ..vi.train import Trainer

    # reference scale by default: 10000 repeats x 100 draws (main_ct_vae.py:648)
    num_repeats = cfg.pixel_dist_repeats if num_repeats is None else num_repeats
    num_samples_1 = (
        cfg.pixel_dist_samples_1 if num_samples_1 is None else num_samples_1
    )
    if trainer is None:
        trainer = Trainer(cfg.replace(train=False, restore=True, use_latest_ckpt=True))
    en = cfg.example_num
    save = cfg.save_path
    cache = os.path.join(save, f"all_reconstructions_{en}.npy") if save else None
    if cache and os.path.exists(cache):
        samples = np.load(cache)
    else:
        samples = collect_pixel_samples(trainer, en, num_repeats, num_samples_1)
        if cache:
            np.save(cache, samples)

    # analytic two-object posterior from our projector's sinograms
    theta = jnp.asarray(trainer.theta)
    from ..data.toy import X_TRAIN_0, X_TRAIN_1

    sino0 = radon(jnp.asarray(X_TRAIN_0), theta, pad=False)
    sino1 = radon(jnp.asarray(X_TRAIN_1), theta, pad=False)
    # the DATA was noised at cfg.poisson_noise_multiplier (create_masks);
    # trainer.state.pnm starts at pnm_start when annealing is on
    h0, h1 = analytic_discrete_posterior(
        jnp.asarray(trainer.all_proj_samples[en]),
        jnp.asarray(trainer.all_masks[en]),
        sino0,
        sino1,
        cfg.poisson_noise_multiplier,
    )

    if save:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        x0 = np.asarray(X_TRAIN_0).reshape(-1)
        x1 = np.asarray(X_TRAIN_1).reshape(-1)
        delta_bin = 0.01
        bins = np.arange(5 * delta_bin / 10, 0.5 + delta_bin, delta_bin)
        for pix in range(samples.shape[1]):
            plt.figure(figsize=[10, 5])
            n, b = np.histogram(samples[:, pix], bins=bins, density=True)
            plt.bar((b[:-1] + b[1:]) / 2, n / n.sum(), width=0.01, label="P-VAE")
            plt.bar(
                [x0[pix], x1[pix]], [float(h0), float(h1)],
                width=delta_bin, edgecolor="black", alpha=0.2, hatch="//",
                label="True Posterior",
            )
            plt.xlim([0, 0.5])
            plt.legend()
            plt.savefig(os.path.join(save, f"pixel_vae_true_exp_{pix}_ex_{en}.png"), dpi=150)
            plt.close()
    return samples, (float(h0), float(h1))
