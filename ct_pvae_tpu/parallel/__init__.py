from .mesh import batch_sharding, make_mesh, replicated_sharding
from .chains import make_chains_mesh, shard_chains
from .distributed import (
    host_local_batch_slice,
    initialize,
    is_primary,
    make_global_batch,
    put_replicated,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "initialize",
    "is_primary",
    "host_local_batch_slice",
    "make_global_batch",
    "put_replicated",
]
