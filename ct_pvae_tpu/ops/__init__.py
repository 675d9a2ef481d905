from .radon import num_proj_pixels, pad_phantom, radon, radon_low_mem, backproject
from .fbp import fbp, fourier_filter
from .sirt import sirt
from .tv import tv_reconstruct

__all__ = [
    "num_proj_pixels",
    "pad_phantom",
    "radon",
    "radon_low_mem",
    "backproject",
    "fbp",
    "fourier_filter",
    "sirt",
    "tv_reconstruct",
]
