"""Standalone dataset visualizer (reference bin/visualize_dataset.py).

Side-by-side views of one example: the FULL sinogram, the PARTIAL sinogram
under a random-angle mask run, the PARTIAL sinogram under a uniform-angle
mask run, and the padded ground-truth image — the figure the reference uses
to illustrate the sparse-view measurement model
(/root/reference/bin/visualize_dataset.py:30-52).

Reference quirks kept:
  * partial sinograms are ``num_sparse_angles * all_proj_samples[en]`` — the
    multiply undoes the 1/nsa dose normalization applied by the mask stage
    (:39-40), so full and partial render on a comparable scale;
  * partial panels share the FULL sinogram's (vmin, vmax) (:33-45);
  * ground truth is zero-padded up to num_proj_pix (:48-51);
  * panels are borderless, tick-free, 300-dpi grayscale PNGs named
    ``<name>_ex_<N>.png`` (helper_functions.py:382-392).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..data import io as data_io


def _plot_panel(img: np.ndarray, out_dir: str, name: str, example_num: int,
                vmin=None, vmax=None) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=[10, 10])
    plt.imshow(np.asarray(img), cmap="gray", vmin=vmin, vmax=vmax)
    plt.xticks([])
    plt.yticks([])
    plt.box(False)
    path = os.path.join(out_dir, f"{name}_ex_{example_num}.png")
    plt.savefig(path, bbox_inches="tight", dpi=300, pad_inches=0.0)
    plt.close()
    return path


def visualize_dataset(
    input_path: str,
    save_path_random: Optional[str] = None,
    save_path_uniform: Optional[str] = None,
    example_num: int = 0,
    num_sparse_angles: int = 20,
    out_dir: Optional[str] = None,
) -> Dict[str, str]:
    """Write the 4-panel set; returns {panel_name: png_path}.

    ``save_path_random`` / ``save_path_uniform`` are run dirs containing
    ``all_proj_samples.npy`` (written by the mask stage); either may be None
    to skip that panel.  ``out_dir`` defaults to ``input_path`` (where the
    reference writes, :391).
    """
    out_dir = input_path if out_dir is None else out_dir
    os.makedirs(out_dir, exist_ok=True)
    written: Dict[str, str] = {}

    sinos, _theta, num_proj_pix = data_io.load_dataset(input_path)
    full = sinos[example_num]
    written["full_sinogram"] = _plot_panel(
        full, out_dir, "full_sinogram", example_num
    )
    vmin, vmax = float(np.min(full)), float(np.max(full))

    for name, run in (
        ("proj_random", save_path_random),
        ("proj_uniform", save_path_uniform),
    ):
        if run is None:
            continue
        proj = np.load(os.path.join(run, "all_proj_samples.npy"))[example_num]
        written[name] = _plot_panel(
            num_sparse_angles * proj, out_dir, name, example_num,
            vmin=vmin, vmax=vmax,
        )

    ground_truth = data_io.load_ground_truth(input_path)[example_num]
    padding = (num_proj_pix - ground_truth.shape[0]) // 2
    ground_truth = np.pad(ground_truth, ((padding, padding), (padding, padding)))
    written["ground_truth"] = _plot_panel(
        ground_truth, out_dir, "ground_truth", example_num
    )
    return written
