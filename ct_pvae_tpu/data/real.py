"""Real-data ingest: HDF5 experiment files -> the sinogram dataset contract.

Reference scripts/preformat_data_h5.py: walks ``*.h5`` files, pulls the middle
z-slice of each exchange/data volume plus its theta array, and writes the
standard dataset artifacts.  Real data skips synthetic noising downstream
(``--real``, create_masks.py:83-84).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import numpy as np

from . import io


def preformat_h5(
    input_dir: str,
    save_path: str,
    data_key: str = "exchange/data",
    theta_key: str = "exchange/theta",
    normalize: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Collect middle-slice sinograms from every .h5 under input_dir.

    Returns (sinograms (N, A, P), theta (A,)) and writes the dataset contract
    files to ``save_path``.
    """
    import h5py

    files = sorted(glob.glob(os.path.join(input_dir, "**", "*.h5"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no .h5 files under {input_dir}")
    sinos: List[np.ndarray] = []
    theta_ref: Optional[np.ndarray] = None
    for path in files:
        with h5py.File(path, "r") as f:
            if data_key not in f or theta_key not in f:
                continue
            data = f[data_key]  # (A, Z, P) projection stack
            theta = np.asarray(f[theta_key][...], np.float32).reshape(-1)
            mid = data.shape[1] // 2
            sino = np.asarray(data[:, mid, :], np.float32)
            if theta_ref is None:
                theta_ref = theta
            elif len(theta) != len(theta_ref):
                continue  # skip inconsistent acquisitions
            if normalize and sino.max() > 0:
                sino = sino / sino.max()
            sinos.append(sino)
    if not sinos:
        raise ValueError("no usable (data, theta) pairs found")
    arr = np.stack(sinos, axis=0)
    arr[arr < 0] = 0
    io.save_dataset(save_path, arr, theta_ref, arr.shape[-1], arr.shape[-1])
    return arr, theta_ref
