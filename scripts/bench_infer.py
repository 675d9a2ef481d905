"""Serving-throughput benchmark: amortized inference on held-out sinograms.

Reconstructs HELD-OUT foam measurements — generated on first use with a
disjoint seed into ``dataset_foam_holdout/``, never seen in training — with
the archived paper-run weights through the production `infer` path
(vi/infer.py: masks/noise/classical-init for the new data + fused
multi-pass posterior summaries) and prints examples/s end to end plus the
steady-state device rate.  The reference has no serving path at all — its
only eval rescored the training set inside the training driver
(main_ct_vae.py:427-461) — so this measures capability the rebuild adds.

Usage: python scripts/bench_infer.py [--n 200] [--passes 8]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200, help="fresh examples to score")
    ap.add_argument("--passes", type=int, default=8, help="latent draws per example")
    ap.add_argument("--ckpt", default="results/foam_paper_run/ckpt-100000.msgpack")
    args = ap.parse_args()

    from ct_pvae_tpu.config import foam_paper_config
    from ct_pvae_tpu.data import io as data_io
    from ct_pvae_tpu.vi.infer import amortized_infer

    # held-out measurements: same geometry/distribution as dataset_foam but a
    # disjoint seed, generated once and cached — the training set is NOT used
    holdout = "dataset_foam_holdout"
    if not os.path.exists(os.path.join(holdout, "x_train_sinograms.npy")):
        from ct_pvae_tpu.data.foam import generate_foam_images
        from ct_pvae_tpu.data.sinogram import images_to_sinograms

        print(f"generating {args.n} held-out foam sinograms (seed 1000) ...")
        imgs = generate_foam_images(args.n, seed=1000)
        th = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
        ho_sinos = images_to_sinograms(imgs, th, pad=True)
        data_io.save_dataset(holdout, ho_sinos, th, imgs.shape[1], imgs.shape[2])
        np.save(os.path.join(holdout, "foam_holdout_truth.npy"), imgs)
    sinos, theta, _ = data_io.load_dataset(holdout)
    n = min(args.n, len(sinos))
    sinos = np.asarray(sinos[:n])

    run_dir = tempfile.mkdtemp(prefix="bench_infer_run_")
    out_dir = tempfile.mkdtemp(prefix="bench_infer_out_")
    cfg = foam_paper_config(input_path="dataset_foam", save_path=run_dir)
    cfg.save(os.path.join(run_dir, "config.json"))
    os.makedirs(os.path.join(run_dir, "training_checkpoints"), exist_ok=True)
    shutil.copy(
        args.ckpt,
        os.path.join(run_dir, "training_checkpoints", os.path.basename(args.ckpt)),
    )

    truth_path = os.path.join(holdout, "foam_holdout_truth.npy")
    if not os.path.exists(truth_path):
        # the holdout set may predate truth archiving; the generator is
        # seeded, so the images regenerate deterministically
        from ct_pvae_tpu.data.foam import generate_foam_images

        print("regenerating held-out ground truth (seed 1000) ...")
        np.save(truth_path, generate_foam_images(len(sinos), seed=1000))
    truth = np.asarray(np.load(truth_path)[:n], np.float32)

    def run(cheap=False, im2col=False):
        ov = {}
        if cheap:
            ov["cheap_init"] = True
        if im2col:
            # forward-only serving benefits from the im2col conv formulation
            # (scripts/probe_conv_fused.py: the lax conv FORWARD lowering runs
            # at ~0.1 TFLOP/s on this backend vs 3.2 for im2col; fwd+bwd —
            # the training step — is neutral).  Identical parameters, only
            # the lowering changes (tests/test_conv_impl.py equivalence).
            ov["conv_impl"] = "im2col"
        return amortized_infer(
            run_dir, out_dir, sinograms=sinos, theta=np.asarray(theta),
            num_passes=args.passes, seed=1, overrides=ov or None,
        )

    def mean_psnr(out):
        from ct_pvae_tpu.eval.metrics import compare

        rec = np.squeeze(np.asarray(out["mean"]))
        gt = truth
        if rec.shape[-2:] != gt.shape[-2:]:  # center-crop the larger to match
            from ct_pvae_tpu.data.recon_init import crop_center

            if rec.shape[-1] > gt.shape[-1]:
                rec = crop_center(rec, gt.shape[-2], gt.shape[-1])
            else:
                gt = crop_center(gt, rec.shape[-2], rec.shape[-1])
        return float(np.mean([
            compare(gt[i], np.clip(rec[i], 0.0, 1.0))[2] for i in range(len(gt))
        ]))

    # cold: setup (masks/noise/classical init for the new data) + compile
    t0 = time.perf_counter()
    out = run()
    cold = time.perf_counter() - t0
    # warm: preprocessing recomputes but compiles are cached — the
    # steady-state rate a serving process achieves on each new dataset
    t0 = time.perf_counter()
    out = run()
    warm = time.perf_counter() - t0
    psnr_full = mean_psnr(out)

    # cheap-init serving mode (config.cheap_init): sirt/tv channels replaced
    # by the one-shot ramp-FBP — measure both the speedup and the fidelity
    # cost on the same held-out data
    run(cheap=True)  # compile pass for the substituted stack
    t0 = time.perf_counter()
    out_cheap = run(cheap=True)
    warm_cheap = time.perf_counter() - t0
    psnr_cheap = mean_psnr(out_cheap)

    run(cheap=True, im2col=True)  # compile pass for the im2col forward
    t0 = time.perf_counter()
    out_fast = run(cheap=True, im2col=True)
    warm_fast = time.perf_counter() - t0
    psnr_fast = mean_psnr(out_fast)

    assert np.isfinite(out["mean"]).all() and (out["std"] >= 0).all()
    print(
        f"serving: {n} examples x {args.passes} passes "
        f"(x{foam_paper_config().num_samples} ELBO samples each), held-out data"
    )
    print(f"  cold (setup+compile): {cold:6.2f} s  ({n / cold:6.1f} ex/s)")
    print(f"  warm end-to-end:      {warm:6.2f} s  ({n / warm:6.1f} ex/s)  "
          f"posterior-mean PSNR {psnr_full:.2f} dB")
    print(f"  warm cheap-init:      {warm_cheap:6.2f} s  ({n / warm_cheap:6.1f} ex/s)  "
          f"posterior-mean PSNR {psnr_cheap:.2f} dB")
    print(f"  warm cheap+im2col:    {warm_fast:6.2f} s  ({n / warm_fast:6.1f} ex/s)  "
          f"posterior-mean PSNR {psnr_fast:.2f} dB")


if __name__ == "__main__":
    main()
