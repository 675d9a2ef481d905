"""Metric implementation tests (skimage-compatible MSE/SSIM/PSNR)."""

import numpy as np

from ct_pvae_tpu.eval.metrics import compare, mse, psnr, ssim


def test_identical_images():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(32, 32))
    m, s, p = compare(a, a)
    assert m == 0.0
    np.testing.assert_allclose(s, 1.0)
    assert np.isinf(p)


def test_mse_psnr_closed_form():
    a = np.zeros((16, 16))
    a[0, 0] = 1.0  # data_range 1
    b = a + 0.1
    assert abs(mse(a, b) - 0.01) < 1e-12
    np.testing.assert_allclose(psnr(a, b, 1.0), 20.0, atol=1e-9)


def test_ssim_known_values():
    # constant-vs-constant with offset: analytic SSIM = (2*u1*u2+c1)/(u1^2+u2^2+c1)
    u1, u2, dr = 0.5, 0.6, 1.0
    a = np.full((32, 32), u1)
    b = np.full((32, 32), u2)
    c1 = (0.01 * dr) ** 2
    expect = (2 * u1 * u2 + c1) / (u1**2 + u2**2 + c1)
    np.testing.assert_allclose(ssim(a, b, dr), expect, rtol=1e-10)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(64, 64))
    s_small = ssim(a, a + 0.01 * rng.normal(size=a.shape), 1.0)
    s_big = ssim(a, a + 0.3 * rng.normal(size=a.shape), 1.0)
    assert s_big < s_small < 1.0


def test_ssim_tiny_image_auto_window():
    # 2x2 images: win_size falls back to smallest odd size (ref
    # helper_functions.py:399-406 behavior)
    a = np.array([[0.1, 0.2], [0.3, 0.4]])
    b = np.array([[0.1, 0.2], [0.3, 0.5]])
    val = ssim(a, b, a.max() - a.min())
    assert np.isfinite(val)


def test_compare_uses_first_image_data_range():
    a = np.zeros((8, 8))
    a[0, 0] = 2.0
    b = np.ones((8, 8))
    m, s, p = compare(a, b)
    np.testing.assert_allclose(p, 10 * np.log10(4.0 / m))


def test_visualize_dataset_panels(tmp_path):
    """Standalone dataset visualizer writes the reference's 4-panel set
    (bin/visualize_dataset.py:30-52) with partial panels de-normalized."""
    from ct_pvae_tpu.data import io as data_io
    from ct_pvae_tpu.eval.dataset_viz import visualize_dataset

    rng = np.random.default_rng(0)
    sinos = rng.uniform(0, 1, (3, 4, 8)).astype(np.float32)
    theta = np.linspace(0, np.pi, 4, endpoint=False).astype(np.float32)
    ds = str(tmp_path / "dataset_foo")
    data_io.save_dataset(ds, sinos, theta, 6, 6)
    data_io.save_ground_truth(
        rng.uniform(0, 1, (3, 6, 6)).astype(np.float32), "foo", str(tmp_path)
    )
    run_r = tmp_path / "run_random"
    run_u = tmp_path / "run_uniform"
    for run in (run_r, run_u):
        run.mkdir()
        np.save(run / "all_proj_samples.npy", sinos / 2.0)

    written = visualize_dataset(
        ds, str(run_r), str(run_u), example_num=1, num_sparse_angles=2
    )
    assert sorted(written) == [
        "full_sinogram", "ground_truth", "proj_random", "proj_uniform",
    ]
    import os

    for path in written.values():
        assert os.path.exists(path) and path.endswith("_ex_1.png")
