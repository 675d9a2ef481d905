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

    # gridrec baseline variant: same ordering, saves under a suffixed name so
    # the parity artifact is never overwritten by an alternative protocol
    merit_g = final_merit(
        imgs, sinos, masks, noisy, recon, theta, 1e4, save_path=str(tmp_path),
        batch=6, baseline_alg="gridrec",
    )
    assert merit_g[2, 0] < merit_g[0, 0] < merit_g[1, 0]
    assert not np.allclose(merit_g[0], merit[0])  # different classical recon
    np.testing.assert_array_equal(saved, np.load(f"{tmp_path}/final_ave_merit.npy"))
    assert np.load(f"{tmp_path}/final_ave_merit_gridrec.npy").shape == (3, 3)


def test_boxplot_five_condition_protocol(tmp_path):
    """Paired random/uniform trials map into the reference's 5-column layout
    (create_box_plot.py:42-47) with median-trial finders; figures render."""
    from ct_pvae_tpu.eval.boxplot import (
        five_condition_table,
        make_box_plots,
        median_trials,
        pair_uniform_paths,
    )

    rng = np.random.default_rng(0)
    rand_paths, unif_paths = [], []
    for t in range(3):
        rp = tmp_path / f"trial{t}"
        up = tmp_path / f"trial{t}_uniform"
        for p in (rp, up):
            p.mkdir()
        np.save(rp / "final_ave_merit.npy", rng.uniform(0, 1, (3, 3)))
        np.save(up / "final_ave_merit.npy", rng.uniform(0, 1, (3, 3)))
        rand_paths.append(str(rp))
        unif_paths.append(str(up))

    assert pair_uniform_paths(rand_paths) == unif_paths

    rand = np.stack([np.load(p + "/final_ave_merit.npy") for p in rand_paths])
    unif = np.stack([np.load(p + "/final_ave_merit.npy") for p in unif_paths])
    tab = five_condition_table(rand, unif)
    assert tab.shape == (3, 5, 3)
    np.testing.assert_array_equal(tab[:, 0], rand[:, 0])  # gridrec full
    np.testing.assert_array_equal(tab[:, 1], unif[:, 1])  # partial uniform
    np.testing.assert_array_equal(tab[:, 2], rand[:, 1])  # partial random
    np.testing.assert_array_equal(tab[:, 3], unif[:, 2])  # P-VAE uniform
    np.testing.assert_array_equal(tab[:, 4], rand[:, 2])  # P-VAE random

    med = median_trials(tab)
    assert set(med) == {
        f"{m}_{k}" for m in ("MSE", "SSIM", "PSNR") for k in ("random", "uniform")
    }
    # odd trial count: exactly one median trial per finder
    for idx in med.values():
        assert len(idx) == 1

    out = tmp_path / "figs"
    make_box_plots(rand_paths, str(out))  # auto-pairs the _uniform siblings
    for name in ("MSE", "SSIM", "PSNR"):
        assert (out / f"{name}_boxplot.png").exists()


def test_boxplot_three_condition_fallback(tmp_path):
    from ct_pvae_tpu.eval.boxplot import make_box_plots

    rng = np.random.default_rng(1)
    paths = []
    for t in range(2):
        p = tmp_path / f"solo{t}"
        p.mkdir()
        np.save(p / "final_ave_merit.npy", rng.uniform(0, 1, (3, 3)))
        paths.append(str(p))
    out = tmp_path / "figs3"
    make_box_plots(paths, str(out))
    assert (out / "MSE_boxplot.png").exists()
