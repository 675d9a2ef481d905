"""Cross-trial box plots of dataset merit (reference bin/create_box_plot.py).

Aggregates ``final_ave_merit.npy`` from multiple run directories.  Two modes:

* **5-condition (the published-figure protocol)** — when every given random-
  mask run has a ``<run>_uniform`` sibling on disk (or ``--uniform_paths`` is
  given explicitly), columns follow create_box_plot.py:42-47:
  (a) gridrec full, (b) gridrec partial uniform, (c) gridrec partial random,
  (d) P-VAE uniform, (e) P-VAE random — plus the reference's median-trial
  finders for every (metric, mask-kind) pair (create_box_plot.py:49-73).
* **3-condition fallback** — no uniform pairing: the three per-run conditions
  (full / partial / P-VAE) straight from each ``final_ave_merit.npy`` row.

Unlike the reference's hard-coded 11-trial directory naming
(create_box_plot.py:12-28), run paths are explicit arguments.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

METRIC_NAMES = ["MSE", "SSIM", "PSNR"]

FIVE_CONDITION_LABELS = [
    "(a) full",
    "(b) partial uniform",
    "(c) partial random",
    "(d) P-VAE uniform",
    "(e) P-VAE random",
]


def load_merits(save_paths: Sequence[str]) -> np.ndarray:
    """(num_runs, 3 conditions, 3 metrics) array of final_ave_merit."""
    out = []
    for sp in save_paths:
        out.append(np.load(os.path.join(sp, "final_ave_merit.npy")))
    return np.stack(out, axis=0)


def pair_uniform_paths(save_paths: Sequence[str]) -> Optional[List[str]]:
    """``<run>_uniform`` sibling for every run, or None if any is missing."""
    pairs = []
    for sp in save_paths:
        up = sp.rstrip("/") + "_uniform"
        if not os.path.exists(os.path.join(up, "final_ave_merit.npy")):
            return None
        pairs.append(up)
    return pairs


def five_condition_table(
    random_merits: np.ndarray, uniform_merits: np.ndarray
) -> np.ndarray:
    """(T, 5, 3) table with the reference's column layout
    (create_box_plot.py:42-47)."""
    t = len(random_merits)
    final_vals = np.zeros((t, 5, 3))
    final_vals[:, 0] = random_merits[:, 0, :]   # gridrec full
    final_vals[:, 1] = uniform_merits[:, 1, :]  # gridrec partial uniform
    final_vals[:, 2] = random_merits[:, 1, :]   # gridrec partial random
    final_vals[:, 3] = uniform_merits[:, 2, :]  # P-VAE uniform
    final_vals[:, 4] = random_merits[:, 2, :]   # P-VAE random
    return final_vals


def median_trials(final_vals: np.ndarray) -> Dict[str, np.ndarray]:
    """Reference's median-trial finders (create_box_plot.py:49-73): for each
    metric and mask kind, the trial indices whose P-VAE merit equals the
    median across trials (empty for even trial counts, like the reference)."""
    trials = np.arange(len(final_vals))
    out: Dict[str, np.ndarray] = {}
    for m, name in enumerate(METRIC_NAMES):
        for col, kind in ((4, "random"), (3, "uniform")):
            vals = final_vals[:, col, m]
            out[f"{name}_{kind}"] = trials[vals == np.median(vals)]
    return out


def make_box_plots(
    save_paths: Sequence[str],
    out_dir: str = ".",
    uniform_paths: Optional[Sequence[str]] = None,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if uniform_paths is None:
        uniform_paths = pair_uniform_paths(save_paths)

    os.makedirs(out_dir, exist_ok=True)
    if uniform_paths is not None:
        if len(uniform_paths) != len(save_paths):
            raise ValueError(
                f"{len(save_paths)} random runs vs {len(uniform_paths)} uniform runs"
            )
        final_vals = five_condition_table(
            load_merits(save_paths), load_merits(uniform_paths)
        )
        labels = FIVE_CONDITION_LABELS
        for key, idx in median_trials(final_vals).items():
            print(f"median trial for {key}: {idx}")
    else:
        final_vals = load_merits(save_paths)  # (T, 3, 3)
        labels = ["full FBP", "partial FBP", "P-VAE"]

    for m, name in enumerate(METRIC_NAMES):
        plt.figure()
        plt.title(name)
        plt.boxplot(final_vals[:, :, m], whis=100, tick_labels=labels)
        plt.xticks(rotation=20)
        plt.savefig(os.path.join(out_dir, f"{name}_boxplot.png"), bbox_inches="tight", dpi=300)
        plt.close()
        med = np.median(final_vals[:, :, m], axis=0)
        print(f"{name} medians: " + ", ".join(f"{l}={v:.4g}" for l, v in zip(labels, med)))
