"""Chain/particle sharding for the MCMC samplers.

The reference runs ONE HMC chain on one device (bin/toy_mcmc_v2.py:139-146).
Here chains (HMC/NUTS) and particles (SMC) are a leading array axis, so the
north-star scaling story (BASELINE.md) is a one-liner: place that axis on a
``chains`` mesh axis and XLA runs every chain's leapfrog on its owning device,
inserting a psum only where chains actually interact (the cross-chain
step-size adaptation mean in hmc.py / the SMC normalization and ESS sums).

No sampler code changes: ``hmc_sample``/``nuts_sample``/``smc_sample`` are
already jitted with chains vmapped, so sharding the inputs is sufficient —
XLA propagates the placement through the scan.  Multi-host slices reuse this
unchanged after ``jax.distributed.initialize`` (the mesh then spans DCN×ICI).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_chains_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh with axis ``chains`` over ``num_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("chains",))


def shard_chains(mesh: Optional[Mesh], tree):
    """Place every array's leading (chain/particle) axis on the mesh.

    The chain count must divide the mesh size.  ``mesh=None`` is a no-op so
    callers can write one code path for 1 and N devices.
    """
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P("chains"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
