"""Tensor-parallel parameter shardings for the transformer (AST) path.

The CNN models are far too small to shard, but the AST backbone (86M params
for base384) benefits from Megatron-style tensor parallelism.  With jit +
sharding this is pure data placement: column-parallel layouts for the
qkv/fc1 kernels, row-parallel for proj/fc2 — XLA inserts the all-reduces at
the row-parallel outputs by itself.

Use with a 2-D mesh ``('data', 'model')``: batch sharded over ``data``,
these parameter layouts over ``model``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-name -> kernel partition spec (Megatron TP layout)
_COL_PARALLEL = ("qkv", "fc1")  # split output features
_ROW_PARALLEL = ("proj", "fc2")  # split input features; output all-reduced


def ast_param_specs(params: Dict[str, Any], axis: str = "model") -> Dict[str, Any]:
    """PartitionSpec pytree for AST params (everything else replicated)."""

    def spec_for(path, leaf) -> P:
        names = [getattr(p, "key", str(p)) for p in path]
        if "kernel" in names:
            if any(n in _COL_PARALLEL for n in names):
                return P(*([None] * (leaf.ndim - 1)), axis)
            if any(n in _ROW_PARALLEL for n in names):
                return P(*([axis] + [None] * (leaf.ndim - 1)))
        if "bias" in names and any(n in _COL_PARALLEL for n in names):
            return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_ast_params(params: Dict[str, Any], mesh: Mesh, axis: str = "model"):
    """Place AST params tensor-parallel over ``mesh[axis]``."""
    specs = ast_param_specs(params, axis)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
