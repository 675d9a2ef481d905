"""High-level importable API (the reference's functions_high_level.py role).

One-call entry points for notebooks and orchestration scripts
(ctvae/functions_high_level.py:17-131 offered create_dataset /
preformat_data / create_masks as library functions).  Everything here wraps
the library modules; nothing is CLI-only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .config import Config, foam_paper_config, foam_quick_config, toy_config
from .data.masks import create_all_masks
from .data.sinogram import make_dataset
from .data.foam import generate_foam_images
from .vi.train import Trainer, run

__all__ = [
    "Config",
    "toy_config",
    "foam_quick_config",
    "foam_paper_config",
    "create_dataset",
    "preformat_data",
    "create_masks",
    "train",
    "Trainer",
]


def create_dataset(
    n_pixel: int = 128,
    size_lower: float = 0.01,
    size_upper: float = 0.2,
    gap: float = 0.0,
    num_train: int = 100,
    save_name: str = "foam_training",
    seed: int = 0,
) -> np.ndarray:
    """Generate foam phantoms and save ``<save_name>.npy``
    (functions_high_level.create_dataset:17-35)."""
    x = generate_foam_images(
        num_train, n_pixel=n_pixel, size_lower=size_lower,
        size_upper=size_upper, gap=gap, seed=seed,
    )
    np.save(save_name + ".npy", x)
    return x


def preformat_data(
    theta: Optional[np.ndarray] = None,
    save_path: str = "dataset_foam_test",
    truncate_dataset: int = 100,
    img_type: str = "foam",
    num_angles: int = 20,
) -> Tuple[np.ndarray, int]:
    """Images -> sinograms with the disk contract
    (functions_high_level.preformat_data:38-75)."""
    if theta is None:
        theta = np.linspace(0, np.pi, num_angles, endpoint=False).astype(np.float32)
    images, sinos, theta = make_dataset(
        img_type, truncate_dataset, save_path=save_path, num_angles=len(theta)
    )
    return sinos, sinos.shape[-1]


def create_masks(
    input_path: str = "dataset_foam_test",
    poisson_noise_multiplier: float = (2**16 - 1) * 0.41,
    num_sparse_angles: int = 5,
    save_tag: str = "masks",
    random: bool = False,
    seed: int = 0,
    noise_model: str = "poisson",
):
    """Masks + noisy measurements under ``input_path/save_tag``
    (functions_high_level.create_masks:77-131; ``noise_model="gaussian"`` is
    its Gaussian-approximation variant, :124-127)."""
    import os

    from .data import io as data_io

    sinos, theta, _ = data_io.load_dataset(input_path)
    return create_all_masks(
        sinos,
        len(theta),
        save_path=os.path.join(input_path, save_tag),
        poisson_noise_multiplier=poisson_noise_multiplier,
        num_sparse_angles=num_sparse_angles,
        random=random,
        train=True,
        truncate_dataset=len(sinos),
        seed=seed,
        noise_model=noise_model,
    )


def train(cfg: Config, sinograms=None, theta=None) -> float:
    """Run the training/eval pipeline; returns loss_final_mean
    (the HPO objective, reference main_ct_vae.py:733-735)."""
    return run(cfg, sinograms=sinograms, theta=theta)
