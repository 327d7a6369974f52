"""FSDP / ZeRO-3-style parameter + optimizer sharding via GSPMD.

The reference's only distribution strategy is DDP: fully replicated
parameters with an NCCL gradient allreduce (reference:
src/audiofakedetect/train_classifier.py:44-47,322).  Replication is the
right call for the ~239k-param CNNs, but the AST path (86M params for
base384, plus two Adam moments = ~1 GB of fp32 state) wastes HBM on every
chip.  On TPU, fully-sharded data parallelism is *pure data placement* —
no wrapper modules, no hooks, no manual collectives:

* every large parameter leaf is sharded along its largest mesh-divisible
  axis over the ``data`` axis (the same axis the batch is sharded over);
* XLA inserts the all-gathers right before each layer's use and
  reduce-scatters the gradients (the ZeRO-3 communication schedule falls
  out of sharding propagation);
* Adam's elementwise update then runs on 1/N of every tensor per chip,
  and the optimizer state never exists unsharded anywhere.

Leaves smaller than ``min_bytes`` stay replicated: all-gathering a
768-byte bias costs more latency than the memory it saves.  For the CNN
models virtually every leaf is below any sensible threshold, so FSDP
degrades gracefully to plain DP — same math, same memory.

Use :func:`shard_fsdp` to place a state pytree and
:func:`make_fsdp_train_step` for a train step whose *output* state is
pinned to the same layout (otherwise the compiler may choose to
rematerialize gathered parameters).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_specs(tree, mesh: Mesh, axis: str = "data", min_bytes: int = 2**14):
    """PartitionSpec pytree: shard each leaf's largest divisible axis.

    Works on arrays and on tracers/ShapeDtypeStructs (only ``shape`` /
    ``dtype`` are read), so it can be used both for placement and inside
    jit for ``with_sharding_constraint``.
    """
    n = mesh.shape[axis]

    def spec(leaf) -> P:
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", None)
        if not shape or dtype is None:
            return P()
        size = 1
        for d in shape:
            size *= int(d)
        if size * jnp.dtype(dtype).itemsize < min_bytes:
            return P()
        for dim in sorted(range(len(shape)), key=lambda i: shape[i], reverse=True):
            if shape[dim] % n == 0:
                out = [None] * len(shape)
                out[dim] = axis
                return P(*out)
        return P()

    return jax.tree.map(spec, tree)


def shard_fsdp(
    tree, mesh: Mesh, axis: str = "data", min_bytes: int = 2**14
) -> Any:
    """Place a param-shaped pytree (params, Adam moments, ...) FSDP-sharded."""
    specs = fsdp_specs(tree, mesh, axis, min_bytes)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        tree,
        specs,
    )


def constrain_fsdp(
    tree, mesh: Mesh, axis: str = "data", min_bytes: int = 2**14
) -> Any:
    """``with_sharding_constraint`` a pytree to its FSDP layout (jit-side)."""
    specs = fsdp_specs(tree, mesh, axis, min_bytes)
    return jax.tree.map(
        lambda leaf, s: jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, s)
        ),
        tree,
        specs,
    )


def _fsdp_step_body(
    model,
    transform,
    tx,
    mesh: Mesh,
    axis: str = "data",
    min_bytes: int = 2**14,
    aug_contrast: bool = False,
    aug_noise: bool = False,
    grad_accum: int = 1,
):
    """The standard train-step body with FSDP-pinned output state.

    Identical math to ``train.steps._train_step_body``; the only addition
    is a sharding constraint on the new params and optimizer state so the
    updated tensors leave the step in the sharded layout (inputs placed by
    :func:`shard_fsdp`, outputs pinned here, and donation reuses the
    buffers in between).
    """
    from ..train.steps import _train_step_body

    body = _train_step_body(
        model, transform, tx, aug_contrast, aug_noise, grad_accum
    )

    def step(state, batch) -> Tuple[Any, Any]:
        new_state, stats = body(state, batch)
        new_state = new_state._replace(
            params=constrain_fsdp(new_state.params, mesh, axis, min_bytes),
            opt_state=constrain_fsdp(new_state.opt_state, mesh, axis, min_bytes),
        )
        return new_state, stats

    return step


def make_fsdp_train_step(
    model,
    transform,
    tx,
    mesh: Mesh,
    axis: str = "data",
    min_bytes: int = 2**14,
    aug_contrast: bool = False,
    aug_noise: bool = False,
    grad_accum: int = 1,
):
    """Jitted FSDP train step (see :func:`_fsdp_step_body`)."""
    return jax.jit(
        _fsdp_step_body(
            model, transform, tx, mesh, axis, min_bytes, aug_contrast,
            aug_noise, grad_accum,
        ),
        donate_argnums=(0,),
    )


def make_fsdp_multi_train_step(
    model,
    transform,
    tx,
    mesh: Mesh,
    axis: str = "data",
    min_bytes: int = 2**14,
    aug_contrast: bool = False,
    aug_noise: bool = False,
    grad_accum: int = 1,
):
    """G chained FSDP steps per dispatch — the sharded twin of
    ``train.steps.make_multi_train_step`` (the layout constraint inside the
    scan body keeps every intermediate state sharded, so peak HBM is the
    sharded footprint regardless of G)."""
    body = _fsdp_step_body(
        model, transform, tx, mesh, axis, min_bytes, aug_contrast,
        aug_noise, grad_accum,
    )

    def multi_step(state, batches):
        return jax.lax.scan(body, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,))
