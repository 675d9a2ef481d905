"""Throughput-vs-batch curve: full-loop steps/s and examples/s at paper shapes.

Round-3 VERDICT Weak #1 / Next #6: the conv stack runs at ~1-2% of MXU peak
because the model's 10-20 channel maps underfill the 128-wide lane dimension
at the reference's parity batch (b=10).  At these shapes throughput should
scale with batch until the MXU saturates; this script measures where, so
users know the hardware's serving/training envelope instead of inheriting
the parity choice.

Method identical to bench.py (full Trainer.train() loop on the paper-scale
5-channel config, warmup pass absorbs compiles, best-of-3 timed passes).

Usage: python scripts/bench_batch_curve.py [--batches 10 20 40 80] [--iters 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[10, 20, 40, 80])
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from ct_pvae_tpu.config import foam_paper_config
    from ct_pvae_tpu.data.sinogram import images_to_sinograms
    from ct_pvae_tpu.vi.train import Trainer

    n_pixel = 128
    rng = np.random.default_rng(0)
    theta = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)

    print(f"{'batch':>6} {'steps/s':>9} {'examples/s':>11} {'rel ex/s':>9}")
    base_ex = None
    for b in args.batches:
        n = max(2 * b, 20)
        imgs = rng.uniform(0, 1, size=(n, n_pixel, n_pixel)).astype(np.float32)
        sinos = images_to_sinograms(imgs, theta, pad=True, batch=n)
        cfg = foam_paper_config(
            truncate_dataset=n,
            batch_size=b,
            train=True,
            num_iter=args.iters,
            save_path=None,
            compute_dtype="float32",
        )
        tr = Trainer(cfg, sinograms=sinos, theta=theta)
        tr.cfg = cfg.replace(num_iter=cfg.steps_per_call + 4)
        tr.train()                                # warmup/compile
        tr.cfg = cfg
        steps_per_s = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            tr.train()
            dt = time.perf_counter() - t0
            steps_per_s = max(steps_per_s, args.iters / dt)
        ex_s = steps_per_s * b
        if base_ex is None:
            base_ex = ex_s
        print(f"{b:>6} {steps_per_s:>9.1f} {ex_s:>11.0f} {ex_s / base_ex:>8.2f}x")


if __name__ == "__main__":
    main()
