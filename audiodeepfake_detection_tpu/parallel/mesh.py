"""Device mesh + sharding helpers.

The reference's distributed runtime is NCCL DDP: gradient all-reduce,
``DistributedSampler`` rank slicing, ``all_gather`` of eval outputs and
SyncBatchNorm moment exchange (reference:
src/audiofakedetect/train_classifier.py:44-47, 119-127, 322, 453-459).

Here the whole of that is expressed as *data placement*: one
``jax.sharding.Mesh`` over the slice, the batch sharded over the ``data``
axis, parameters replicated.  Inside a single jitted train step XLA then
derives every collective itself — gradient ``psum`` from the replicated
parameter layout, global batch-norm moments from reductions over the sharded
batch axis (== SyncBatchNorm), eval-metric sums likewise.  There is no
hand-written communication code to keep correct.

For multi-host slices, ``jax.distributed.initialize`` + per-host data
feeding via ``jax.make_array_from_process_local_data`` replaces torchrun's
rendezvous.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default is a 1-D ``('data',)`` mesh — the parallelism the model family
    needs (models are ~240k params; batch is the only large axis).  Extra
    axes (e.g. ``('data', 'model')``) are supported for the AST/transformer
    path.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis over ``axis``."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def data_stage_mesh(
    pp_stages: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """``('data', 'stage')`` mesh for GPipe pipeline parallelism.

    ``pp_stages`` devices form the pipeline axis; the rest do DP.  Single
    source of truth for the layout — the Trainer and the experiment
    driver both build PP meshes here.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % pp_stages:
        raise ValueError(
            f"pp_stages={pp_stages} does not divide {n} devices"
        )
    return get_mesh(
        devices,
        axis_names=("data", "stage"),
        shape=(n // pp_stages, pp_stages),
    )


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data", batch_axis: int = 0):
    """Place a host batch pytree with the batch axis sharded over the mesh.

    Single-controller: plain ``device_put`` with a batch sharding.  Multi
    host (``jax.process_count() > 1``): each process passes only its LOCAL
    slice of the global batch and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the
    ``DistributedSampler``-fed DDP feeding path of the reference
    (train_classifier.py:119-127), expressed as data placement.

    Batches whose leading dimension is not divisible by the mesh axis size
    fall back to replication (correct, just not distributed); this changes
    batch-norm/gradient batch semantics, so it warns.  The loaders pad
    batches to a fixed divisible shape, so this should never fire in the
    training/eval paths.
    """
    multihost = jax.process_count() > 1
    # each process passes its LOCAL slice, so divisibility is against the
    # devices this process contributes to the axis
    n = int(
        mesh.local_mesh.shape[axis] if multihost else mesh.shape[axis]
    )

    def place(x):
        if np.ndim(x) > batch_axis and np.shape(x)[batch_axis] % n == 0:
            spec = [None] * np.ndim(x)
            spec[batch_axis] = axis
            sharding = NamedSharding(mesh, P(*spec))
            if multihost:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)
                )
            return jax.device_put(x, sharding)
        if np.ndim(x) >= 1:
            if multihost:
                raise ValueError(
                    f"shard_batch: local batch dim {np.shape(x)[batch_axis]}"
                    f" not divisible by this process's {n} devices on mesh"
                    f" axis '{axis}' — replication is not possible across"
                    " processes; pad the loader batch"
                )
            import warnings

            warnings.warn(
                f"shard_batch: leading dim {np.shape(x)[0]} not divisible by"
                f" mesh axis '{axis}' ({n}); replicating — batch-norm and"
                " gradient semantics differ from the sharded path",
                stacklevel=3,
            )
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree.map(place, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def device_prefetch(iterator, mesh: Mesh, depth: int = 2):
    """Overlap host->device transfer with compute.

    Wraps a host-batch iterator so the next ``depth`` batches are already
    being transferred (``device_put`` is async) while the current step runs —
    the double-buffering the reference gets from pinned-memory DataLoader
    workers (train_classifier.py:131-140), without worker processes.
    """
    from collections import deque

    queue = deque()
    for batch in iterator:
        queue.append(shard_batch(mesh, batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
