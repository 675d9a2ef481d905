"""Foam-scale posterior study: image-space MCMC vs the amortized VAE posterior.

Round-3 VERDICT Next #1 deliverable: on paper-run objects, sample the exact
per-object posterior (true-Poisson likelihood through the Pallas projector +
TV prior, mcmc/image_model.py) with NUTS and SMC, and score the posterior
mean against (a) the classical partial-angle init the chains start from,
(b) the trained VAE's sampled reconstruction (the reference's eval quirk) and
posterior mean.  Also reports the correlation between the MCMC posterior std
map and the VAE's latent-uncertainty std (amortized vs exact uncertainty).

Writes results/mcmc_foam/summary.md (+ per-example .npy maps).

Usage: python scripts/mcmc_foam_study.py --run runs/foam_paper_run_r4 \
          [--examples 0 1 2] [--steps 400] [--burnin 300] [--chains 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/foam_paper_run_r4")
    ap.add_argument("--examples", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--burnin", type=int, default=300)
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--prior_weight", type=float, default=10.0)
    ap.add_argument("--max_depth", type=int, default=6)
    ap.add_argument("--smc_beta0", type=float, default=0.0,
                    help="warm-start inverse temperature for the smc sampler")
    ap.add_argument("--init_source", default="classical",
                    choices=["classical", "vae"])
    ap.add_argument("--steps_smc", type=int, default=None,
                    help="override --steps for the smc sampler")
    ap.add_argument("--out", default="results/mcmc_foam")
    ap.add_argument("--samplers", nargs="+", default=["nuts", "smc"])
    ap.add_argument("--chunk", type=int, default=64,
                    help="outer NUTS steps per device call; the exact-f32 "
                         "gather projector needs ~16 at 128^2 to keep each "
                         "call under the remote backend's kill threshold")
    args = ap.parse_args()

    from ct_pvae_tpu.config import Config
    from ct_pvae_tpu.data import io as data_io
    from ct_pvae_tpu.eval.mcmc_run import run_foam_mcmc
    from ct_pvae_tpu.eval.metrics import compare

    cfg = Config.load(os.path.join(args.run, "config.json"))
    gt_all = data_io.load_ground_truth(cfg.input_path)
    recon_final = np.load(os.path.join(args.run, "reconstruction_final.npy"))
    mean_path = os.path.join(args.run, "reconstruction_mean.npy")
    recon_mean = np.load(mean_path) if os.path.exists(mean_path) else None
    init_stack = np.load(os.path.join(args.run, "all_input_encode.npy"))

    os.makedirs(args.out, exist_ok=True)
    lines = [
        "# Foam-scale posterior study (image-space MCMC vs amortized VAE)",
        "",
        f"run: {args.run}; {args.chains} chains x {args.steps} draws "
        f"(+{args.burnin} burnin) per example; TV prior w={args.prior_weight}; "
        "true-Poisson likelihood through the Pallas projector "
        "(mcmc/image_model.py).",
        "",
        "| example | sampler | draws/s | step | R-hat max | ESS min/med | "
        "PSNR init | PSNR VAE sample | PSNR VAE mean | PSNR MCMC mean | "
        "std corr (MCMC vs VAE) |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]

    def psnr(gt, img):
        if img is None:
            return float("nan")
        return compare(gt, np.clip(np.squeeze(img), 0.0, 1.0))[2]

    for en in args.examples:
        gt = np.asarray(gt_all[en], np.float32)
        for sampler in args.samplers:
            steps = args.steps
            if sampler == "smc" and args.steps_smc is not None:
                steps = args.steps_smc
            out = run_foam_mcmc(
                args.run,
                number_of_steps=steps,
                burnin=args.burnin,
                example_num=en,
                num_chains=args.chains,
                sampler=sampler,
                prior="tv",
                prior_weight=args.prior_weight,
                max_depth=args.max_depth,
                chunk=args.chunk,
                smc_beta0=args.smc_beta0,
                init_source=args.init_source,
                output_prefix=f"{args.out.rstrip('/').split('/')[-1]}_tmp",
                seed=en,
            )
            np.save(os.path.join(args.out, f"mcmc_mean_{sampler}_{en}.npy"), out["mean"])
            np.save(os.path.join(args.out, f"mcmc_std_{sampler}_{en}.npy"), out["std"])

            # VAE uncertainty comparison: reconstruction_std from infer if
            # present, else skip the correlation column
            vae_std_path = os.path.join(args.run, "reconstruction_std.npy")
            corr = float("nan")
            if os.path.exists(vae_std_path):
                vs = np.squeeze(np.load(vae_std_path)[en])
                corr = float(np.corrcoef(vs.ravel(), out["std"].ravel())[0, 1])

            dg = out.get("diag", {})
            rhat = dg.get("rhat_max", float("nan"))
            ess_s = (
                f"{dg['ess_min']:.0f}/{dg['ess_med']:.0f}"
                if "ess_min" in dg else "-"
            )
            lines.append(
                f"| {en} | {sampler} | {out['draws'] / out['seconds']:.2f} | "
                f"{dg.get('final_step_size', float('nan')):.2e} | "
                f"{rhat:.3f} | {ess_s} | "
                f"{psnr(gt, init_stack[en, :, :, 0]):.2f} | "
                f"{psnr(gt, recon_final[en]):.2f} | "
                f"{psnr(gt, recon_mean[en] if recon_mean is not None else None):.2f} | "
                f"{psnr(gt, out['mean']):.2f} | {corr:.3f} |"
            )
            print(lines[-1])
            # incremental flush: a timeout mid-study keeps finished rows
            with open(os.path.join(args.out, "summary.md"), "w") as f:
                f.write("\n".join(lines) + "\n")

    print(f"wrote {args.out}/summary.md")


if __name__ == "__main__":
    main()
