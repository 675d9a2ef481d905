"""Honest per-step timing through the Trainer's own programs.

Times (a) the donated single train step chained state->state, and (b) the
steps_per_call lax.scan chunk, exactly as Trainer.train() dispatches them.
Optionally sweeps config variants to decompose per-step cost by component
(ELBO samples, angle count, init channels, projector backend).

Usage: python scripts/profile_scan.py [--variants]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ct_pvae_tpu.config import foam_paper_config
from ct_pvae_tpu.data.sinogram import images_to_sinograms
from ct_pvae_tpu.vi.train import Trainer


def build(cfg_kw, sinos, theta):
    cfg = foam_paper_config(
        truncate_dataset=20, train=True, num_iter=200, save_path=None, **cfg_kw
    )
    return Trainer(cfg, sinograms=sinos, theta=theta)


def time_loop(tr, iters=120) -> float:
    """Seconds/step through Trainer.train() (compile pre-absorbed)."""
    cfg = tr.cfg
    tr.cfg = cfg.replace(num_iter=cfg.steps_per_call + 4)
    tr.train()
    tr.cfg = cfg.replace(num_iter=iters)
    t0 = time.perf_counter()
    tr.train()
    dt = time.perf_counter() - t0
    tr.cfg = cfg
    return dt / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(20, 128, 128)).astype(np.float32)
    theta = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=20)

    base = build({}, sinos, theta)
    t = time_loop(base)
    print(f"paper loop (spc=8):            {t*1e3:7.2f} ms/step  {1/t:6.1f} steps/s")

    # single-step dispatch path (spc=1): isolates per-dispatch overhead
    tr1 = build({"steps_per_call": 1}, sinos, theta)
    t1 = time_loop(tr1)
    print(f"paper loop (spc=1):            {t1*1e3:7.2f} ms/step  {1/t1:6.1f} steps/s")

    if not args.variants:
        return

    variants = [
        ("spc=32", {"steps_per_call": 32}),
        ("ns=1 (1 ELBO sample)", {"num_samples": 1}),
        ("api=10 (half angles)", {"angles_per_iter": 10}),
        ("gridrec-only init (2ch)", {"algorithms": ["gridrec"]}),
        ("XLA gather projector", {"use_pallas": False}),
        ("bf16 convs", {"compute_dtype": "bfloat16"}),
        ("il=0 (no intermediate convs)", {"intermediate_layers": 0}),
        ("ks=2, ik=2 (2x2 kernels)", {"kernel_size": 2, "intermediate_kernel": 2}),
        ("nfm=40 (2x channels)", {"num_feature_maps": 40}),
    ]
    for name, kw in variants:
        tr = build(kw, sinos, theta)
        tv = time_loop(tr)
        print(f"{name:30s} {tv*1e3:7.2f} ms/step  {1/tv:6.1f} steps/s")


if __name__ == "__main__":
    main()
