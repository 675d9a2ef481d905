"""CPU probe for the image-NUTS step-size collapse (round 5 diagnosis).

Replicates run_foam_mcmc's chunked warmup loop on a synthetic 32^2 foam
target (small enough for CPU NUTS) and A/Bs the adaptation policy:

  A  production: curvature metric + dual averaging + Welford install @80%
  B  curvature metric only (mass_install off)
  C  identity metric (control — the r4 collapse regime)

Prints step size, draw-time accept, split R-hat / ESS, and posterior-mean
PSNR per variant.  Run with JAX_PLATFORMS=cpu.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ct_pvae_tpu.mcmc import NUTSConfig, nuts_sample
from ct_pvae_tpu.mcmc.diagnostics import effective_sample_size, split_rhat
from ct_pvae_tpu.mcmc.image_model import (
    estimate_curvature_diag,
    init_chains_from_recon,
    make_image_log_prob,
    softplus_forward,
)
from ct_pvae_tpu.ops.radon import num_proj_pixels, radon
from ct_pvae_tpu.ops.fbp import fbp


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--variants", default="BAC", help="subset of {A,B,C}")
    ap.add_argument("--burnin", type=int, default=256)
    ap.add_argument("--draws", type=int, default=128)
    args = ap.parse_args()

    h = args.h
    pnm = 1e4
    nsa = 20
    chains = 4
    burnin, draws, depth, chunk = args.burnin, args.draws, 5, 64

    gt64 = np.load("foam_64_training.npy", mmap_mode="r")[0]
    f = 64 // h
    gt = (np.asarray(gt64, np.float32).reshape(h, f, h, f).mean(axis=(1, 3))
          if f > 1 else np.asarray(gt64, np.float32))
    theta = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
    n_det = num_proj_pixels(h, h)
    proj_full = radon(jnp.asarray(gt)[None], jnp.asarray(theta), pad=True)[0]

    mask = np.zeros(180, np.float32)
    mask[::9] = 1.0 / nsa
    used = mask > 0
    rates = jnp.clip(proj_full * mask[:, None], 0, None) * pnm
    meas_full = jax.random.poisson(jax.random.PRNGKey(7), rates) / pnm
    meas = jnp.asarray(np.asarray(meas_full)[used])
    theta_used = theta[used]
    mask_used = jnp.asarray(mask[used])

    # init: ramp-FBP of the used angles, then / 10 to mimic the encoder
    # normalization convention, then the Poisson-ML amp correction
    # (mcmc_run.py) — the full production warm-start path.
    recon = np.asarray(
        fbp(meas[None] * nsa, jnp.asarray(theta_used), h, h)[0]
    )
    recon = np.clip(recon, 0, None) / 10.0
    pred = radon(jnp.asarray(recon)[None], jnp.asarray(theta_used), pad=True,
                 n_det=n_det)[0] * mask_used[:, None]
    amp = float(jnp.sum(meas) / jnp.maximum(jnp.sum(pred), 1e-8))
    recon = recon * amp

    def psnr(img):
        m = np.mean((gt - np.clip(np.asarray(img), 0, 1)) ** 2)
        return -10 * np.log10(max(m, 1e-12))

    print(f"init psnr {psnr(recon):.2f} (amp {amp:.2f})")

    log_prob = make_image_log_prob(meas, theta_used, mask_used, pnm, h, h,
                                   prior="tv", prior_weight=10.0)
    curv = estimate_curvature_diag(
        init_chains_from_recon(jnp.asarray(recon), 1, jax.random.PRNGKey(3))[0],
        meas, theta_used, mask_used, pnm, h, h,
        prior="tv", prior_weight=10.0, key=jax.random.PRNGKey(4),
    )
    dim = h * h

    def variant(name, inv_mass, install):
        key = jax.random.PRNGKey(0)
        k_init, k_run = jax.random.split(key)
        state = init_chains_from_recon(jnp.asarray(recon), chains, k_init)
        warm_cfg = NUTSConfig(num_results=0, num_burnin=chunk, step_size=1e-2,
                              max_depth=depth, adapt_mass=False)
        accum_cfg = NUTSConfig(num_results=0, num_burnin=chunk, step_size=1e-2,
                               max_depth=depth, adapt_mass=True,
                               welford_window=(0.0, 1.0), install_mass=False)
        cont_cfg = NUTSConfig(num_results=chunk, num_burnin=0, step_size=1e-2,
                              max_depth=depth, adapt_step_size=False,
                              adapt_mass=False)
        welford = (jnp.zeros((), jnp.float32), jnp.zeros((dim,), jnp.float32),
                   jnp.zeros((dim,), jnp.float32))
        n_chunks = (burnin + chunk - 1) // chunk
        accum_from = int(0.3 * n_chunks)
        install_at = max(int(0.8 * n_chunks), accum_from + 1) if install else None
        step_size = None
        t0 = time.time()
        for ci in range(n_chunks):
            k_run, kc = jax.random.split(k_run)
            if ci >= accum_from and (install_at is None or ci < install_at):
                _, d = nuts_sample(log_prob, state, kc, accum_cfg,
                                   inv_mass0=inv_mass, step_size0=step_size,
                                   welford0=welford)
                welford = d["welford"]
            else:
                _, d = nuts_sample(log_prob, state, kc, warm_cfg,
                                   inv_mass0=inv_mass, step_size0=step_size)
            state, step_size = d["final_state"], d["final_step_size"]
            print(f"  [{name}] chunk {ci}: step {float(step_size):.3e} "
                  f"accept {float(d['accept_rate']):.3f}", flush=True)
            if install_at is not None and ci + 1 == install_at:
                n = float(np.asarray(welford[0]))
                if n >= 8:
                    var = np.asarray(welford[2]) / max(n - 1.0, 1.0)
                    shrink = n / (n + 5.0)
                    inv_mass = jnp.asarray(
                        np.maximum(shrink * var +
                                   (1.0 - shrink) * np.asarray(inv_mass), 1e-12),
                        jnp.float32)
        # draws
        outs = []
        accs = []
        for _ in range(draws // chunk):
            k_run, kc = jax.random.split(k_run)
            samples, d = nuts_sample(log_prob, state, kc, cont_cfg,
                                     inv_mass0=inv_mass, step_size0=step_size)
            state = d["final_state"]
            outs.append(np.asarray(samples))
            accs.append(float(d["accept_rate"]))
        s = np.concatenate(outs, axis=0)          # (draws, chains, D)
        o = np.asarray(softplus_forward(jnp.asarray(s)))
        rhat = split_rhat(s)
        ess = effective_sample_size(s)
        mean_img = o.mean(axis=(0, 1)).reshape(h, h)
        print(f"[{name}] step {float(step_size):.3e} draw-accept "
              f"{np.mean(accs):.3f} rhat_max {float(np.max(rhat)):.3f} "
              f"rhat_med {float(np.median(rhat)):.3f} "
              f"ess_min {float(np.min(ess)):.0f} ess_med {float(np.median(ess)):.0f} "
              f"psnr {psnr(mean_img):.2f} ({time.time()-t0:.0f}s)", flush=True)

    if "B" in args.variants:
        variant("B curv-only", 1.0 / curv, install=False)
    if "A" in args.variants:
        variant("A curv+install", 1.0 / curv, install=True)
    if "C" in args.variants:
        variant("C identity", None, install=False)


if __name__ == "__main__":
    main()
