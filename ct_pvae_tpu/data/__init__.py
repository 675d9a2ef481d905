from .foam import generate_foam_images
from .toy import generate_toy_images, toy_theta
from .sinogram import images_to_sinograms, make_dataset
from .masks import create_all_masks
from .recon_init import classical_recon_stack, crop_center
from . import io

__all__ = [
    "generate_foam_images",
    "generate_toy_images",
    "toy_theta",
    "images_to_sinograms",
    "make_dataset",
    "create_all_masks",
    "classical_recon_stack",
    "crop_center",
    "io",
]
