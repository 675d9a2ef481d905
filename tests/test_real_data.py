"""HDF5 real-data ingest (reference scripts/preformat_data_h5.py role)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from ct_pvae_tpu.data import io as data_io
from ct_pvae_tpu.data.real import preformat_h5


def _write_h5(path, a=12, z=5, p=16, scale=1.0):
    with h5py.File(path, "w") as f:
        rng = np.random.default_rng(0)
        f["exchange/data"] = scale * rng.uniform(size=(a, z, p)).astype(np.float32)
        f["exchange/theta"] = np.linspace(0, np.pi, a, endpoint=False).astype(np.float32)


def test_preformat_h5_collects_middle_slices(tmp_path):
    d = tmp_path / "h5s"
    d.mkdir()
    _write_h5(d / "scan1.h5")
    _write_h5(d / "scan2.h5", scale=3.0)
    save = str(tmp_path / "dataset_real")
    sinos, theta = preformat_h5(str(d), save)
    assert sinos.shape == (2, 12, 16)
    assert len(theta) == 12
    # normalized per scan
    assert sinos.max() <= 1.0 + 1e-6
    # disk contract written
    s2, t2, p2 = data_io.load_dataset(save)
    np.testing.assert_array_equal(s2, sinos)
    assert p2 == 16


def test_preformat_h5_slice_selection(tmp_path):
    """'all' / int slice modes: volumes become slices-as-batch examples."""
    d = tmp_path / "h5s"
    d.mkdir()
    _write_h5(d / "scan1.h5", z=5)
    _write_h5(d / "scan2.h5", z=5, scale=2.0)
    all_s, _ = preformat_h5(str(d), str(tmp_path / "o_all"), slices="all")
    assert all_s.shape == (10, 12, 16)
    three, _ = preformat_h5(str(d), str(tmp_path / "o_3"), slices=3)
    assert three.shape == (6, 12, 16)
    # evenly spaced selection includes first, middle, last of each scan
    with h5py.File(d / "scan1.h5") as f:
        vol = np.asarray(f["exchange/data"][...], np.float32)
    for i, z in enumerate([0, 2, 4]):
        expect = vol[:, z, :]
        expect = expect / expect.max()
        np.testing.assert_allclose(three[i], expect, rtol=1e-6)
    # middle (default) stays reference-parity: one slice per scan
    mid, _ = preformat_h5(str(d), str(tmp_path / "o_mid"))
    np.testing.assert_allclose(mid[0], all_s[2])
    with pytest.raises(ValueError):
        preformat_h5(str(d), str(tmp_path / "o_bad"), slices=0)


def test_preformat_h5_skips_inconsistent_and_requires_files(tmp_path):
    d = tmp_path / "h5s"
    d.mkdir()
    _write_h5(d / "a.h5", a=10)
    _write_h5(d / "b.h5", a=7)  # inconsistent angle count -> skipped
    sinos, theta = preformat_h5(str(d), str(tmp_path / "out"))
    assert sinos.shape[0] == 1
    with pytest.raises(FileNotFoundError):
        preformat_h5(str(tmp_path / "empty_nonexistent"), str(tmp_path / "o2"))


def test_real_data_end_to_end_training(tmp_path):
    """The full real-data workflow (reference README "real data" recipe):
    .h5 scans -> preformat middle slices -> --real training (no synthetic
    Poisson noising, create_masks.py:83-84) -> finite descending loss +
    reconstruction artifact."""
    from ct_pvae_tpu.config import Config
    from ct_pvae_tpu.data.sinogram import images_to_sinograms
    from ct_pvae_tpu.data.foam import generate_foam_images
    from ct_pvae_tpu.vi.train import Trainer

    # synthesize "scans": real tomographic structure, projected with our op
    d = tmp_path / "h5s"
    d.mkdir()
    n, a, npix = 6, 24, 16
    imgs = generate_foam_images(n, n_pixel=npix, seed=3)
    theta = np.linspace(0, np.pi, a, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=n)
    for i in range(n):
        with h5py.File(d / f"scan{i}.h5", "w") as f:
            # (A, z, P): middle z-slice is the real sinogram
            vol = np.stack([0.5 * sinos[i], sinos[i], 0.5 * sinos[i]], axis=1)
            f["exchange/data"] = vol.astype(np.float32)
            f["exchange/theta"] = theta

    save_ds = str(tmp_path / "dataset_real")
    got, th = preformat_h5(str(d), save_ds)
    assert got.shape == (n, a, sinos.shape[-1])

    run = str(tmp_path / "real_run")
    cfg = Config(
        input_path=save_ds, save_path=run, train=True, real_data=True,
        truncate_dataset=n, batch_size=3, num_iter=30, num_sparse_angles=6,
        angles_per_iter=6, num_samples=1, num_blocks=2, use_normal=True,
        no_pad=True, algorithms=["gridrec"], save_interval=1000,
    )
    tr = Trainer(cfg, sinograms=got, theta=th)
    # --real skips noising: masked measurements are exact masked projections
    np.testing.assert_allclose(
        np.asarray(tr.all_proj_samples),
        np.asarray(got[:n]) * np.asarray(tr.all_masks)[:, :, None],
        rtol=1e-5, atol=1e-6,
    )
    tr.train()
    losses = tr.metrics.history["loss"]
    assert np.isfinite(losses).all()
    mean_loss = tr.final_evaluation()
    assert np.isfinite(mean_loss)
    rec = np.load(f"{run}/reconstruction_final.npy")
    assert rec.shape[0] == n and np.isfinite(rec).all()
