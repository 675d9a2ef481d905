from .metrics import compare, mse, psnr, ssim

__all__ = ["compare", "mse", "ssim", "psnr"]
