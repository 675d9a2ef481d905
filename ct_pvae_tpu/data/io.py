"""On-disk artifact contract (SURVEY.md §1 table).

The reference's layers communicate through ``.npy`` files; the same names are
kept so parity tooling and a migrating user's scripts keep working:

  <ds>/x_train_sinograms.npy       (N, A, P) float
  <ds>/dataset_parameters.npy      object array [theta, num_proj_pix]
  <ds>/x_size.npy, y_size.npy      original image sizes
  <prefix>_training.npy            (N, H, W) ground truth
  <save>/all_masks.npy             (N, A)
  <save>/all_proj_samples.npy      (N, A, P)
  <save>/all_input_encode.npy      (N, x, y, num_algorithms+1)
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def create_folder(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def save_dataset(save_path: str, sinograms: np.ndarray, theta: np.ndarray, x_size: int, y_size: int) -> None:
    create_folder(save_path)
    np.save(os.path.join(save_path, "x_train_sinograms.npy"), sinograms)
    np.save(
        os.path.join(save_path, "dataset_parameters.npy"),
        np.array([theta, sinograms.shape[-1]], dtype=object),
    )
    np.save(os.path.join(save_path, "x_size.npy"), x_size)
    np.save(os.path.join(save_path, "y_size.npy"), y_size)


def load_dataset(input_path: str) -> Tuple[np.ndarray, np.ndarray, int]:
    """Returns (sinograms, theta, num_proj_pix) — reference get_sinograms
    (helper_functions.py:50-56)."""
    theta, num_proj_pix = np.load(
        os.path.join(input_path, "dataset_parameters.npy"), allow_pickle=True
    )
    sinos = np.load(os.path.join(input_path, "x_train_sinograms.npy"))
    return sinos, np.asarray(theta, np.float32), int(num_proj_pix)


def save_ground_truth(images: np.ndarray, img_type: str, root: str = ".") -> str:
    path = os.path.join(root, f"{img_type}_training.npy")
    np.save(path, images)
    return path


def load_ground_truth(input_path: str) -> np.ndarray:
    """Resolve '<root>/dataset_<name>' -> '<root>/<name>_training.npy'."""
    norm = os.path.normpath(input_path)
    base = os.path.basename(norm)
    root = os.path.dirname(norm)
    if base.startswith("dataset_"):
        name = base[len("dataset_") :]
    else:
        name = base
    return np.load(os.path.join(root, f"{name}_training.npy"))
