"""TPU-vs-CPU numerics discriminator for the image-MCMC target (round 5).

Builds the EXACT sampler target (deviance likelihood + TV prior + softplus,
gather projector) for runs/val64 example 0, then at deterministic points:
  * log_prob value and gradient norm
  * leapfrog Delta-H over 32 steps at eps in {1e-2, 1e-3, 1e-4} with the
    curvature metric — the quantity the MH accept test exponentiates.
Writes <out>.npz so a CPU run and a TPU run can be diffed directly.

Usage: python scripts/mcmc_numerics_probe.py --out runs/numerics_tpu
       JAX_PLATFORMS=cpu ... --out runs/numerics_cpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/val64")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ct_pvae_tpu.config import Config
    from ct_pvae_tpu.mcmc.image_model import (
        estimate_curvature_diag,
        init_chains_from_recon,
        make_image_log_prob,
    )
    from ct_pvae_tpu.ops.radon import radon

    cfg = Config.load(os.path.join(args.run, "config.json"))
    masks = np.load(os.path.join(args.run, "all_masks.npy"))
    proj = np.load(os.path.join(args.run, "all_proj_samples.npy"))
    init_stack = np.load(os.path.join(args.run, "all_input_encode.npy"))
    mask = masks[0]
    used = mask > 1e-12
    import ct_pvae_tpu.data.io as data_io

    _, theta, _ = data_io.load_dataset(cfg.input_path)
    theta_used = np.asarray(theta)[used]
    mask_used = jnp.asarray(mask[used])
    meas = jnp.asarray(proj[0][used])
    recon = np.clip(init_stack[0, :, :, 0], 0, None)
    h = recon.shape[0]

    pred = radon(jnp.asarray(recon)[None], jnp.asarray(theta_used), pad=True,
                 n_det=int(meas.shape[-1]))[0] * mask_used[:, None]
    amp = float(jnp.sum(meas) / jnp.maximum(jnp.sum(pred), 1e-8))
    recon = recon * amp

    lp = make_image_log_prob(meas, theta_used, mask_used,
                             cfg.poisson_noise_multiplier, h, h,
                             prior="tv", prior_weight=10.0, use_pallas=False)
    x0 = init_chains_from_recon(jnp.asarray(recon), 1, jax.random.PRNGKey(3))[0]
    curv = estimate_curvature_diag(
        x0, meas, theta_used, mask_used, cfg.poisson_noise_multiplier, h, h,
        prior="tv", prior_weight=10.0, key=jax.random.PRNGKey(4),
        use_pallas=False,
    )
    inv_mass = 1.0 / curv

    vg = jax.jit(jax.value_and_grad(lp))
    v0, g0 = vg(x0)

    # deterministic unit momentum (no RNG: platform-independent)
    r0 = jnp.sin(jnp.arange(x0.shape[0], dtype=jnp.float32) * 0.37)

    def leapfrog_dh(eps, n=32):
        def ham(z, r):
            return -lp(z) + 0.5 * jnp.sum(r * r * inv_mass)

        def body(c, _):
            z, r = c
            _, g = vg(z)
            r = r + 0.5 * eps * g
            z = z + eps * inv_mass * r
            _, g = vg(z)
            r = r + 0.5 * eps * g
            return (z, r), None

        (zf, rf), _ = jax.lax.scan(body, (x0, r0), None, length=n)
        return ham(zf, rf) - ham(x0, r0)

    dh = {f"dh_{e:g}": float(leapfrog_dh(e)) for e in (1e-2, 1e-3, 1e-4)}
    out = dict(
        lp0=float(v0),
        gnorm=float(jnp.linalg.norm(g0)),
        g_head=np.asarray(g0[:16]),
        curv_head=np.asarray(curv[:16]),
        curv_min=float(curv.min()), curv_max=float(curv.max()),
        amp=amp,
        **dh,
    )
    for k, v in out.items():
        if np.ndim(v) == 0:
            print(f"{k}: {v}")
    np.savez(args.out + ".npz", **out)
    print("platform:", jax.devices()[0].platform)


if __name__ == "__main__":
    main()
