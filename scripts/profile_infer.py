"""Attribute serving (amortized-inference) wall time to pipeline stages.

Round-3 VERDICT Weak #4 / Next #7: warm serving ran at 3.1 ex/s while the
VAE forward runs ~330 ex/s — >94% of warm time was attributed to "the init
stack" in aggregate.  This script breaks the warm path into its stages so
the attack lands on the right one:

  masks+noise     create_all_masks (host Poisson + device ops)
  init:<alg>      each classical algorithm batch-reconstructed alone
  init:stack      the production 5-channel stack in one jit (as served)
  device-put      host->device upload of the dataset dict

(The amortized VAE-forward stage itself is measured by bench_infer.py's
1-vs-8-pass split; this script covers the preprocessing stages.)

Usage: python scripts/profile_infer.py [--n 200]
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
    ap.add_argument("--n", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ct_pvae_tpu.config import foam_paper_config
    from ct_pvae_tpu.data import io as data_io
    from ct_pvae_tpu.data.masks import create_all_masks
    from ct_pvae_tpu.data.recon_init import classical_recon_stack

    holdout = "dataset_foam_holdout"
    if not os.path.exists(os.path.join(holdout, "x_train_sinograms.npy")):
        from ct_pvae_tpu.data.foam import generate_foam_images
        from ct_pvae_tpu.data.sinogram import images_to_sinograms

        imgs = generate_foam_images(args.n, seed=1000)
        th = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
        hs = images_to_sinograms(imgs, th, pad=True)
        data_io.save_dataset(holdout, hs, th, imgs.shape[1], imgs.shape[2])
    sinos, theta, _ = data_io.load_dataset(holdout)
    sinos = np.clip(np.asarray(sinos[: args.n], np.float32), 0, None)
    n = len(sinos)
    cfg = foam_paper_config(truncate_dataset=n)
    x_size = int(np.floor(sinos.shape[-1] / np.sqrt(2) - 2))

    def timed(label, fn, warm=1):
        for _ in range(warm):
            fn()
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "device") else x, out
        )
        dt = time.perf_counter() - t0
        print(f"{label:24s} {dt:8.2f} s   ({n / dt:7.1f} ex/s)")
        return out, dt

    (masks_proj, t_masks) = timed(
        "masks+noise",
        lambda: create_all_masks(
            sinos, len(theta),
            poisson_noise_multiplier=cfg.poisson_noise_multiplier,
            num_sparse_angles=cfg.num_sparse_angles,
            random=cfg.random_angles, train=True,
            truncate_dataset=n, seed=1,
        ),
    )[0], None
    all_masks, all_proj = masks_proj

    for algs in (["gridrec"], ["sirt"], ["tv"], ["fbp"], cfg.algorithms):
        label = "init:" + "+".join(algs) if len(algs) == 1 else "init:stack(5ch)"
        timed(
            label,
            lambda a=algs: classical_recon_stack(
                all_proj, all_masks, theta, a, x_size, x_size, train=True
            ),
        )

    # device upload of the serving data dict
    data_np = {
        "proj_sample": all_proj.astype(np.float32),
        "mask": all_masks.astype(np.float32),
    }

    def upload():
        out = {k: jnp.asarray(v) for k, v in data_np.items()}
        jax.block_until_ready(list(out.values()))
        return out

    timed("device-put (meas)", upload)
    print("(VAE forward rate: see bench_infer.py 1-vs-8-pass split)")


if __name__ == "__main__":
    main()
