"""Dataset-merit evaluation test on small synthetic data (CPU)."""

import numpy as np

from ct_pvae_tpu.data.foam import generate_foam_images
from ct_pvae_tpu.data.masks import create_all_masks
from ct_pvae_tpu.data.sinogram import images_to_sinograms
from ct_pvae_tpu.eval.merit import final_merit


def test_final_merit_orders_conditions(tmp_path):
    """Full-sinogram FBP must beat the sparse-angle baseline; a perfect
    'reconstruction' must beat both."""
    n, n_pix, n_ang = 6, 32, 60
    imgs = generate_foam_images(n, n_pixel=n_pix, seed=0)
    theta = np.linspace(0, np.pi, n_ang, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=n)
    masks, noisy = create_all_masks(
        sinos, n_ang, poisson_noise_multiplier=1e4, num_sparse_angles=10,
        train=True, truncate_dataset=n,
    )
    # pretend the model reconstructed perfectly
    recon = imgs.copy()
    merit = final_merit(
        imgs, sinos, masks, noisy, recon, theta, 1e4, save_path=str(tmp_path), batch=6
    )
    assert merit.shape == (3, 3)
    mse_full, mse_partial, mse_pvae = merit[:, 0]
    psnr_full, psnr_partial, psnr_pvae = merit[:, 2]
    assert mse_pvae < mse_full < mse_partial
    assert psnr_pvae > psnr_full > psnr_partial
    saved = np.load(f"{tmp_path}/final_ave_merit.npy")
    np.testing.assert_array_equal(saved, merit)
