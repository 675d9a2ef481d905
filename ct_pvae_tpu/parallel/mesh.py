"""Device mesh and sharding helpers.

The reference has no tensor distribution at all — its only parallelism is an
external MPI/NCCL *trial farm* (SURVEY.md §2.2).  Here parallelism is a single
``jax.sharding.Mesh`` with two axes:

  data   — dataset examples (batch dim), the DP axis
  angle  — projection angles of the physics likelihood: each device projects
           and scores its angle shard, XLA psums the log-likelihood (the
           domain analogue of sequence/context parallelism)

Collectives are inserted by XLA from sharding annotations (no hand-written
NCCL/MPI).  Multi-host: call ``jax.distributed.initialize`` before building
the mesh; the same code then spans DCN x ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, angle: int = 1, devices=None) -> Optional[Mesh]:
    """Build a (data, angle) mesh; None means single-device (no sharding)."""
    if data * angle <= 1:
        return None
    if devices is None:
        devices = jax.devices()
    if data * angle > len(devices):
        raise ValueError(
            f"mesh {data}x{angle} needs {data*angle} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[: data * angle]).reshape(data, angle)
    return Mesh(dev_array, ("data", "angle"))


def batch_sharding(mesh: Optional[Mesh], *spec) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P())
