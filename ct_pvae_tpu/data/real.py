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


def _slice_indices(n_z: int, slices) -> List[int]:
    """Resolve the z-slice selection for one (A, Z, P) projection volume.

    ``"middle"`` emits one middle slice per scan, analogous to the
    reference's single-slice ingest (preformat_data_h5.py:44-53) but not
    line-for-line parity: the reference indexes ``num_z//2 - 1`` and this
    module takes ``n_z//2`` of the z axis, and our optional per-sinogram
    max normalization (``normalize=True``) has no reference counterpart —
    conscious deviations, recorded like the rest in PARITY.md.
    ``"all"`` emits every slice, and an int emits
    that many evenly spaced slices — each selected slice becomes an
    independent training example.  Sparse-view CT volumes are separable in
    z (each detector row is its own 2-D sinogram), so slices-as-batch is
    the TPU-native way to reconstruct a 3-D scan: the batch axis of one
    device, or the ``data`` mesh axis across chips.
    """
    if slices == "middle":
        return [n_z // 2]
    if slices == "all":
        return list(range(n_z))
    n = int(slices)
    if n <= 0:
        raise ValueError(f"slices={slices!r}: use 'middle', 'all', or a positive int")
    if n >= n_z:
        return list(range(n_z))
    return [round(i * (n_z - 1) / (n - 1)) for i in range(n)] if n > 1 else [n_z // 2]


def preformat_h5(
    input_dir: str,
    save_path: str,
    data_key: str = "exchange/data",
    theta_key: str = "exchange/theta",
    normalize: bool = True,
    slices="middle",
) -> Tuple[np.ndarray, np.ndarray]:
    """Collect per-slice sinograms from every .h5 under input_dir.

    ``slices`` selects z rows per scan ("middle" | "all" | int count; see
    ``_slice_indices``).  Returns (sinograms (N, A, P), theta (A,)) and
    writes the dataset contract files to ``save_path``.
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
            if theta_ref is None:
                theta_ref = theta
            elif len(theta) != len(theta_ref):
                continue  # skip inconsistent acquisitions
            for z in _slice_indices(data.shape[1], slices):
                sino = np.asarray(data[:, z, :], np.float32)
                if normalize and sino.max() > 0:
                    sino = sino / sino.max()
                sinos.append(sino)
    if not sinos:
        raise ValueError("no usable (data, theta) pairs found")
    arr = np.stack(sinos, axis=0)
    arr[arr < 0] = 0
    io.save_dataset(save_path, arr, theta_ref, arr.shape[-1], arr.shape[-1])
    return arr, theta_ref
