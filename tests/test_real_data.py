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


def test_preformat_h5_skips_inconsistent_and_requires_files(tmp_path):
    d = tmp_path / "h5s"
    d.mkdir()
    _write_h5(d / "a.h5", a=10)
    _write_h5(d / "b.h5", a=7)  # inconsistent angle count -> skipped
    sinos, theta = preformat_h5(str(d), str(tmp_path / "out"))
    assert sinos.shape[0] == 1
    with pytest.raises(FileNotFoundError):
        preformat_h5(str(tmp_path / "empty_nonexistent"), str(tmp_path / "o2"))
