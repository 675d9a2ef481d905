"""Foam-generator + classical-init fidelity study (SURVEY hard parts #3/#5).

The reference builds foams with ``xdesign.Foam`` (scripts/
create_foam_images.py:24-44: porosity ~ U(0,1) per image, void radii in
[0.01, 0.2], gap 0) and its init/recon stack uses tomopy gridrec.  Neither
library exists here, and no reference-generated dataset ships with the repo,
so cross-repo metric comparisons entangle THREE differences: the generator,
the noise realization, and the recon algorithm.  This module disentangles
what can be measured self-contained:

  1. ``porosity_fidelity`` — target-vs-achieved porosity curve of our
     packer.  The reference recipe's only distributional knob is
     porosity ~ U(0,1); a packer that saturates early produces
     systematically denser foams than xdesign's insertion loop.
  2. ``recon_fidelity`` — full-sinogram FBP metric DISTRIBUTIONS
     (MSE/SSIM/PSNR over N fresh foams) at the paper operating point
     (180 angles, pnm=1e4), split into the NOISELESS algorithm floor and
     the noisy operating point, per porosity bin.  The noiseless row
     isolates recon-algorithm quality from dataset/noise effects; the
     spread across porosity bins bounds how much generator drift can move
     the headline numbers (reference single points:
     create_box_plot.py:105-111).

Run via ``cli fidelity``; writes fidelity.json + FIDELITY.md to --out.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.foam import _pack_voids, generate_foam_images
from ..data.sinogram import images_to_sinograms
from ..ops.fbp import fbp
from .metrics import compare


def porosity_fidelity(
    targets: Optional[np.ndarray] = None, trials: int = 3, seed: int = 0
) -> Dict:
    """Achieved void fraction vs target for the packer; xdesign's recipe
    draws targets from U(0,1) so unreachable targets skew the dataset."""
    if targets is None:
        targets = np.linspace(0.05, 0.95, 10)
    rows = []
    for t in targets:
        ach = []
        for s in range(trials):
            rng = np.random.default_rng(seed + 1000 + s)
            _, radii = _pack_voids(rng, float(t), 0.01, 0.2, 0.0)
            ach.append(float(np.sum(radii**2)))  # void area/pi over disk area/pi
        rows.append(
            {"target": float(t), "achieved_mean": float(np.mean(ach)),
             "achieved_std": float(np.std(ach))}
        )
    sat = max(r["achieved_mean"] for r in rows)
    return {"curve": rows, "saturation": sat}


def recon_fidelity(
    num: int = 100,
    n_pixel: int = 128,
    num_angles: int = 180,
    pnm: float = 1.0e4,
    seed: int = 0,
    batch: int = 25,
) -> Dict:
    """Full-sino FBP metric distributions on N fresh foams.

    Returns per-image MSE/SSIM/PSNR for (a) noiseless sinograms — the
    ramp-FBP algorithm floor — and (b) Poisson-noised sinograms at ``pnm``
    — the merit stage's full-sino condition (eval/merit.py) — plus
    porosity-binned medians.
    """
    imgs = generate_foam_images(num, n_pixel=n_pixel, seed=seed + 7)
    porosity = 1.0 - np.asarray(imgs).reshape(num, -1).mean(axis=1) / (
        np.pi / 4.0
    )  # void fraction inside the unit disk (disk covers pi/4 of the square)
    theta = np.linspace(0, np.pi, num_angles, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=batch)
    p = sinos.shape[-1]
    theta_j = jnp.asarray(theta)

    key = jax.random.PRNGKey(seed)
    noisy = (
        np.asarray(jax.random.poisson(key, jnp.asarray(sinos) * pnm)).astype(
            np.float32
        )
        / pnm
    )

    recon_f = jax.jit(lambda s: fbp(s, theta_j, n_pixel, n_pixel, "ramp"))

    def metric_rows(s):
        out = []
        for lo in range(0, num, batch):
            rec = np.asarray(recon_f(jnp.asarray(s[lo : lo + batch])))
            rec = np.clip(rec, 0.0, 1.0)  # merit clips recons (final_merit.py:60-96)
            for r, g in zip(rec, imgs[lo : lo + batch]):
                out.append(compare(g, r))
        return np.asarray(out)  # (N, 3)

    clean = metric_rows(sinos)
    noised = metric_rows(noisy)

    def summarize(m):
        return {
            "mse_median": float(np.median(m[:, 0])),
            "ssim_median": float(np.median(m[:, 1])),
            "psnr_median": float(np.median(m[:, 2])),
            "mse_iqr": [float(np.percentile(m[:, 0], q)) for q in (25, 75)],
            "ssim_iqr": [float(np.percentile(m[:, 1], q)) for q in (25, 75)],
            "psnr_iqr": [float(np.percentile(m[:, 2], q)) for q in (25, 75)],
        }

    bins = np.digitize(porosity, [0.25, 0.5, 0.75])
    by_porosity = []
    for b, label in enumerate(["<0.25", "0.25-0.5", "0.5-0.75", ">0.75"]):
        sel = bins == b
        if not sel.any():
            continue
        by_porosity.append(
            {"bin": label, "n": int(sel.sum()),
             "noisy_psnr_median": float(np.median(noised[sel, 2])),
             "noisy_ssim_median": float(np.median(noised[sel, 1]))}
        )
    return {
        "num": num, "pnm": pnm, "num_angles": num_angles,
        "porosity_mean": float(porosity.mean()),
        "noiseless_floor": summarize(clean),
        "noisy_operating_point": summarize(noised),
        "by_porosity": by_porosity,
        "reference_full_sino_point": {"mse": 6.95e-3, "ssim": 0.933, "psnr": 21.74},
    }


def fidelity_report(out_dir: str, num: int = 100, seed: int = 0) -> Dict:
    os.makedirs(out_dir, exist_ok=True)
    res = {
        "porosity": porosity_fidelity(seed=seed),
        "recon": recon_fidelity(num=num, seed=seed),
    }
    with open(os.path.join(out_dir, "fidelity.json"), "w") as f:
        json.dump(res, f, indent=1)
    return res
