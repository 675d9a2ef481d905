"""Benchmark harness: foam-model ELBO training steps/s on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no steps/s numbers (SURVEY.md §6); its per-run timing
artifacts are wall-clock minutes on unspecified hardware.  ``vs_baseline``
therefore reports against REF_STEPS_PER_S_ESTIMATE, our documented estimate of
the reference TF2.8 implementation on its era GPU for the paper-scale foam
recipe (b=10, 128^2 images, api=20 angles, ns=2 ELBO samples — README.md:221).
BASELINE.md's build target is >=5x that estimate (vs_baseline >= 5).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Documented estimate of the reference's training throughput for the
# paper-scale foam step (TF 2.8, single V100-class GPU).  100k iters in a
# multi-hour NERSC run and the per-step work (2 ELBO samples x (conv stack +
# 20-angle rotate-project of 10 images)) put it at single-digit steps/s.
REF_STEPS_PER_S_ESTIMATE = 5.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ct_pvae_tpu.config import foam_paper_config
    from ct_pvae_tpu.data.sinogram import images_to_sinograms
    from ct_pvae_tpu.vi.train import Trainer

    # Paper-scale per-step shapes (README.md:221), truncated dataset for setup
    # speed (dataset size does not affect per-step cost: batch is a gather).
    cfg = foam_paper_config(
        truncate_dataset=20,
        train=True,
        num_iter=1,
        save_path=None,
        algorithms=["gridrec"],  # init algorithms don't affect step cost
        compute_dtype="float32",   # quality-run dtype; bf16 convs train poorly
                                   # and buy ~no speed (projector dominates)
    )
    n_pixel = 128
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(cfg.truncate_dataset, n_pixel, n_pixel)).astype(np.float32)
    theta = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=cfg.truncate_dataset)

    tr = Trainer(cfg, sinograms=sinos, theta=theta)
    key = jax.random.PRNGKey(0)
    batch_idx = jnp.arange(cfg.batch_size, dtype=jnp.int32)
    angle_idx = jnp.arange(cfg.angles_per_iter, dtype=jnp.int32)

    # compile + warmup
    state = tr.state
    for i in range(3):
        key, sk = jax.random.split(key)
        state, loss, _ = tr._train_step(state, tr.data, batch_idx, angle_idx, sk)
    float(loss)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        key, sk = jax.random.split(key)
        state, loss, _ = tr._train_step(state, tr.data, batch_idx, angle_idx, sk)
    # a host read of the final loss forces the whole dependent chain; on this
    # remote backend block_until_ready alone can under-wait
    float(loss)
    dt = time.perf_counter() - t0
    steps_per_s = iters / dt

    print(
        json.dumps(
            {
                "metric": "foam_elbo_train_steps_per_s_per_chip",
                "value": round(steps_per_s, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / REF_STEPS_PER_S_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
