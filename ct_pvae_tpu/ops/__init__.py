from .radon import num_proj_pixels, pad_phantom, radon, radon_low_mem, backproject
from .fbp import fbp, fourier_filter, voronoi_angle_weights
from .gridrec import gridrec
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
    "voronoi_angle_weights",
    "gridrec",
    "sirt",
    "tv_reconstruct",
]
