"""Device-mesh utilities: sharding, replication, cross-host gathers."""

from .mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
