"""Device-mesh utilities: sharding, replication, SP/TP layouts."""

from .mesh import (  # noqa: F401
    batch_sharding,
    device_prefetch,
    get_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .fsdp import (  # noqa: F401
    constrain_fsdp,
    fsdp_specs,
    make_fsdp_train_step,
    shard_fsdp,
)
from .pipeline import (  # noqa: F401
    make_pp_train_step,
    pipeline_encode,
    pp_ast_logits,
    stack_block_params,
)
from .sequence import sp_wpt_analysis  # noqa: F401
from .tensor import ast_param_specs, shard_ast_params  # noqa: F401
