"""Multi-host launch helpers.

The reference's only multi-node story is an MPI/NCCL *trial farm* driven by
Slurm + hpo-uq YAML (SURVEY.md §2.2/§5.8).  TPU-natively, multi-host data/
angle/chain parallelism is the same single-program code with a bigger mesh:

  1. every host calls ``initialize()`` (jax.distributed handshake over DCN)
  2. build the same ``Mesh`` from ``jax.devices()`` (all hosts' chips)
  3. jit the same step with the same shardings; XLA routes collectives over
     ICI within a slice and DCN across hosts

Host-local data loading: each host feeds the shard of the batch living on its
chips (``host_local_batch_slice``); checkpointing/metrics happen on host 0.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU metadata when
    running on Cloud TPU VMs)."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(num_processes or os.environ["NUM_PROCESSES"]),
            process_id=int(process_id or os.environ["PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on the host that owns checkpointing/metrics."""
    return jax.process_index() == 0


def host_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of a globally-sharded batch dim."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return i * per, per
