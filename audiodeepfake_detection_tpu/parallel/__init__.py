"""Device-mesh utilities: sharding, replication, SP/TP layouts."""

from .mesh import (  # noqa: F401
    batch_sharding,
    device_prefetch,
    get_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .sequence import sp_wpt_analysis  # noqa: F401
from .tensor import ast_param_specs, shard_ast_params  # noqa: F401
