"""Data-layer tests: foam generator, toy layout, masks, IO contract, recon stack."""

import numpy as np
import pytest

from ct_pvae_tpu.data import io as data_io
from ct_pvae_tpu.data.foam import generate_foam_images
from ct_pvae_tpu.data.masks import create_all_masks, make_masks
from ct_pvae_tpu.data.recon_init import classical_recon_stack, crop_center
from ct_pvae_tpu.data.sinogram import images_to_sinograms, make_dataset
from ct_pvae_tpu.data.toy import X_TRAIN_0, X_TRAIN_1, generate_toy_images, toy_theta


def test_foam_images_match_reference_contract():
    imgs = generate_foam_images(3, n_pixel=64, seed=0)
    assert imgs.shape == (3, 64, 64)
    assert imgs.dtype == np.float32
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # material disk present, voids carved: interior mean strictly between 0, 1
    assert 0.05 < imgs.mean() < 0.8
    # reproducible
    np.testing.assert_array_equal(imgs, generate_foam_images(3, n_pixel=64, seed=0))
    # different porosity per image
    means = imgs.reshape(3, -1).mean(1)
    assert len(np.unique(np.round(means, 3))) == 3


def test_toy_images_exact_reference_layout():
    x = generate_toy_images(num_tiles=3)
    assert x.shape == (12, 2, 2)
    # [x0, x0, x1, x1] tiled (create_toy_images.py:35-41)
    np.testing.assert_array_equal(x[0], X_TRAIN_0)
    np.testing.assert_array_equal(x[1], X_TRAIN_0)
    np.testing.assert_array_equal(x[2], X_TRAIN_1)
    np.testing.assert_array_equal(x[3], X_TRAIN_1)
    np.testing.assert_array_equal(x[4], X_TRAIN_0)


def test_toy_sinograms_analytic():
    """Toy projections are exact row/col sums (with the reference's batch-flip
    bug corrected — see test_radon.test_theta_90_is_flipped_row_sums)."""
    imgs = generate_toy_images(num_tiles=1)
    sinos = images_to_sinograms(imgs, toy_theta(), pad=False, batch=4)
    np.testing.assert_allclose(sinos[0, 0], imgs[0].sum(axis=0), atol=1e-5)
    np.testing.assert_allclose(sinos[0, 1], imgs[0].sum(axis=1)[::-1], atol=1e-5)


def test_uniform_masks_spacing_and_dose():
    masks = make_masks(4, num_angles=180, num_sparse_angles=20, random=False)
    assert masks.shape == (4, 180)
    nz = np.nonzero(masks[0])[0]
    assert len(nz) == 20
    assert np.all(np.diff(nz) == 9)  # ceil(180/20)
    np.testing.assert_allclose(masks.sum(axis=1), 1.0)  # dose-preserving 1/nsa


def test_random_masks_per_example():
    masks = make_masks(8, num_angles=30, num_sparse_angles=5, random=True, seed=1)
    counts = (masks > 0).sum(axis=1)
    np.testing.assert_array_equal(counts, 5)
    assert not np.all(masks[0] == masks[1])  # different subsets per example


def test_toy_masks_alternating():
    masks = make_masks(8, 2, 1, toy_masks=True)
    np.testing.assert_array_equal(masks[:4], [[1, 0], [0, 1], [1, 0], [0, 1]])


def test_toy_masks_dose_normalized_for_nsa2():
    # create_masks.py:60-61 divides toy masks by nsa like every other mode
    masks = make_masks(4, 2, 2, toy_masks=True)
    np.testing.assert_array_equal(masks[:2], [[0.5, 0], [0, 0.5]])


def test_toy_masks_require_two_angles():
    with pytest.raises(ValueError, match="num_angles == 2"):
        make_masks(4, 180, 1, toy_masks=True)


def test_create_all_masks_poisson_noise_and_cache(tmp_path):
    rng = np.random.default_rng(0)
    sinos = rng.uniform(0.5, 1.0, size=(8, 6, 10)).astype(np.float32)
    save = str(tmp_path)
    masks, noisy = create_all_masks(
        sinos, 6, save_path=save, poisson_noise_multiplier=1e4,
        num_sparse_angles=3, train=True, truncate_dataset=8,
    )
    assert noisy.shape == (8, 6, 10)
    masked = sinos * masks[:, :, None]
    # high SNR: relative deviation small where mask nonzero
    nz = masked > 0
    rel = np.abs(noisy[nz] - masked[nz]) / masked[nz]
    assert rel.mean() < 0.05
    assert np.all(noisy[~nz] == 0)
    # reload path (train=False) returns the cached arrays
    m2, n2 = create_all_masks(sinos, 6, save_path=save, train=False)
    np.testing.assert_array_equal(m2, masks)
    np.testing.assert_array_equal(n2, noisy)


def test_real_data_skips_noise():
    sinos = np.ones((4, 4, 5), np.float32)
    masks, meas = create_all_masks(
        sinos, 4, save_path=None, num_sparse_angles=2, real_data=True,
        train=True, truncate_dataset=4,
    )
    np.testing.assert_allclose(meas, sinos * masks[:, :, None])


def test_dataset_io_roundtrip(tmp_path):
    save = str(tmp_path / "dataset_foo")
    sinos = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    theta = np.array([0.0, 0.5, 1.0], np.float32)
    data_io.save_dataset(save, sinos, theta, 4, 4)
    s2, t2, p2 = data_io.load_dataset(save)
    np.testing.assert_array_equal(s2, sinos)
    np.testing.assert_array_equal(t2, theta)
    assert p2 == 4
    gt = np.ones((2, 4, 4), np.float32)
    data_io.save_ground_truth(gt, "foo", str(tmp_path))
    np.testing.assert_array_equal(data_io.load_ground_truth(save), gt)


def test_crop_center_matches_reference_semantics():
    img = np.arange(100).reshape(10, 10)
    c = crop_center(img, 4, 4)
    assert c.shape == (4, 4)
    np.testing.assert_array_equal(c, img[3:7, 3:7])
    c_odd = crop_center(img, 5, 5)
    assert c_odd.shape == (5, 5)


def test_classical_recon_stack_shape_and_channels(tmp_path):
    imgs = generate_foam_images(4, n_pixel=32, seed=0)
    theta = np.linspace(0, np.pi, 24, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=4)
    masks = make_masks(4, 24, 6)
    noisy = sinos * masks[:, :, None]
    stack = classical_recon_stack(
        noisy, masks, theta, ["gridrec", "sirt"], 32, 32, save_path=str(tmp_path), batch=4
    )
    assert stack.shape == (4, 32, 32, 3)  # 2 algorithms + mask channel
    assert np.isfinite(stack).all()
    # cached reload
    stack2 = classical_recon_stack(noisy, masks, theta, ["gridrec", "sirt"], 32, 32,
                                   save_path=str(tmp_path), train=False)
    np.testing.assert_array_equal(stack, stack2)


def test_classical_recon_stack_gridrec_fourier_channel():
    """'gridrec_fourier' routes to the true regridding algorithm: on a full
    (unmasked) sinogram it must agree with the ramp-FBP channel to recon-grade
    tolerance (both discretize the same inversion integral) while not being
    the identical operator."""
    imgs = generate_foam_images(2, n_pixel=32, seed=1)
    theta = np.linspace(0, np.pi, 48, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=2)
    masks = np.ones((2, 48), np.float32)
    stack = classical_recon_stack(
        sinos, masks, theta, ["gridrec", "gridrec_fourier"], 32, 32, batch=2
    )
    assert stack.shape == (2, 32, 32, 3)
    assert np.isfinite(stack).all()
    ramp, four = stack[..., 0], stack[..., 1]
    err = np.abs(four - ramp).mean() / (np.abs(ramp).mean() + 1e-12)
    assert err < 0.35, err          # same integral, different discretization
    assert err > 1e-4               # actually a different operator


def test_reuse_cache_masks_and_stack(tmp_path):
    """--reuse_cache: train-mode reload of cached preprocessing when shapes
    match; regeneration otherwise."""
    import os

    from ct_pvae_tpu.data.masks import create_all_masks
    from ct_pvae_tpu.data.recon_init import classical_recon_stack

    rng = np.random.default_rng(0)
    sinos = rng.uniform(0.1, 1.0, size=(6, 8, 9)).astype(np.float32)
    theta = np.linspace(0, np.pi, 8, endpoint=False).astype(np.float32)
    sp = str(tmp_path)

    m1, p1 = create_all_masks(sinos, 8, save_path=sp, num_sparse_angles=2,
                              train=True, truncate_dataset=6, seed=0)
    # poison the cache to prove reuse loads it rather than regenerating
    np.save(os.path.join(sp, "all_proj_samples.npy"), p1 * 2.0)
    _, p2 = create_all_masks(sinos, 8, save_path=sp, num_sparse_angles=2,
                             train=True, truncate_dataset=6, seed=0,
                             reuse_cache=True)
    np.testing.assert_allclose(p2, p1 * 2.0)
    # shape mismatch -> regenerated
    _, p3 = create_all_masks(sinos, 8, save_path=sp, num_sparse_angles=2,
                             train=True, truncate_dataset=4, seed=0,
                             reuse_cache=True)
    assert p3.shape[0] == 4

    stack1 = classical_recon_stack(p1, m1, theta, ["gridrec"], 4, 4,
                                   save_path=sp, train=True)
    np.save(os.path.join(sp, "all_input_encode.npy"), stack1 + 1.0)
    stack2 = classical_recon_stack(p1, m1, theta, ["gridrec"], 4, 4,
                                   save_path=sp, train=True, reuse_cache=True)
    np.testing.assert_allclose(stack2, stack1 + 1.0)


def test_gaussian_noise_model_moments():
    """noise_model='gaussian': Normal(proj, sqrt(proj/pnm)) approximation
    (functions_high_level.py:124-127) — mean/variance match the target."""
    from ct_pvae_tpu.data.masks import create_all_masks

    rng = np.random.default_rng(1)
    sinos = rng.uniform(0.5, 1.0, size=(2000, 4, 3)).astype(np.float32)
    pnm = 100.0
    masks, samples = create_all_masks(
        sinos, 4, poisson_noise_multiplier=pnm, num_sparse_angles=4,
        train=True, truncate_dataset=2000, seed=0, noise_model="gaussian",
    )
    proj = sinos * masks[:, :, None]
    resid = samples - proj
    np.testing.assert_allclose(resid.mean(), 0.0, atol=5e-4)
    np.testing.assert_allclose(
        resid.std(), np.sqrt(proj / pnm).mean(), rtol=0.05
    )
    import pytest as _pytest
    with _pytest.raises(ValueError):
        create_all_masks(sinos, 4, num_sparse_angles=4, train=True,
                         truncate_dataset=8, noise_model="bogus")


def test_foam_packer_reaches_high_porosity_targets():
    """Adaptive radius shrinking (xdesign's insertion-loop analogue) must
    reach targets well past the ~0.65 dart-throwing saturation — the
    reference draws porosity ~ U(0,1) (create_foam_images.py:39), so a
    saturating packer would skew the whole dataset denser."""
    from ct_pvae_tpu.data.foam import _pack_voids

    rng = np.random.default_rng(0)
    _, radii = _pack_voids(rng, 0.75, 0.01, 0.2, 0.0)
    achieved = float(np.sum(radii**2))
    assert achieved >= 0.72, achieved
    # low targets must not overshoot badly
    rng = np.random.default_rng(1)
    _, radii = _pack_voids(rng, 0.1, 0.01, 0.2, 0.0)
    assert float(np.sum(radii**2)) < 0.25


def test_fidelity_report_structure(tmp_path):
    from ct_pvae_tpu.eval.fidelity import fidelity_report, porosity_fidelity

    res = fidelity_report(str(tmp_path), num=4, seed=0)
    assert set(res) == {"porosity", "recon"}
    rec = res["recon"]
    assert rec["noiseless_floor"]["psnr_median"] >= rec[
        "noisy_operating_point"
    ]["psnr_median"] - 1e-6
    cur = porosity_fidelity(targets=np.array([0.2]), trials=1)
    assert abs(cur["curve"][0]["achieved_mean"] - 0.2) < 0.1
    import os

    assert os.path.exists(tmp_path / "fidelity.json")


def test_cheap_init_substitutes_iterative_channels():
    """Serving cheap-init mode (config.cheap_init): sirt/tv channels become
    the one-shot ramp-FBP — SAME channel count/order, so a model trained on
    the full stack still serves."""
    import jax.numpy as jnp
    from ct_pvae_tpu.data.recon_init import classical_recon_stack

    rng = np.random.default_rng(0)
    n, a, p = 3, 8, 32
    theta = np.linspace(0, np.pi, a, endpoint=False).astype(np.float32)
    proj = rng.uniform(0.0, 1.0, (n, a, p)).astype(np.float32)
    masks = np.zeros((n, a), np.float32)
    masks[:, ::2] = 1.0 / (a // 2)
    algs = ["sirt", "tv", "fbp", "gridrec"]
    full = classical_recon_stack(proj, masks, theta, algs, 20, 20)
    cheap = classical_recon_stack(proj, masks, theta, algs, 20, 20, cheap_init=True)
    assert cheap.shape == full.shape == (n, 20, 20, len(algs) + 1)
    # sirt/tv slots now carry the gridrec (ramp-FBP) reconstruction
    np.testing.assert_allclose(cheap[..., 0], cheap[..., 3], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cheap[..., 1], cheap[..., 3], rtol=1e-5, atol=1e-5)
    # fbp/gridrec/mask channels are untouched by the substitution
    np.testing.assert_allclose(cheap[..., 2:], full[..., 2:], rtol=1e-5, atol=1e-5)
    # and the full stack's iterative channels really are different algorithms
    assert not np.allclose(full[..., 0], full[..., 3])
