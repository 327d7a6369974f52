"""Dataset normalization statistics (Welford) and per-channel normalize.

TPU-native equivalent of the reference's ``WelfordEstimator``
(reference: src/audiofakedetect/data_loader.py:27-71) and
``torchvision.transforms.Normalize`` usage
(reference: src/audiofakedetect/wavelet_math.py:380-382).

The Welford update is a pure function over a small state pytree so it can be
jitted and folded into the transform pass; the reference instead runs a
separate full pass over the training set with batch size 4000
(reference: src/audiofakedetect/wavelet_math.py:419-441).  Under a sharded
batch the ``jnp.sum`` reductions are global, so multi-chip statistics come
out identical to single-chip ones.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class WelfordState(NamedTuple):
    """Running statistics over all axes except the last (channel) axis."""

    count: jnp.ndarray  # scalar f32
    mean: jnp.ndarray  # [C]
    m2: jnp.ndarray  # [C]


def welford_init(num_channels: int, dtype=jnp.float32) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((num_channels,), dtype),
        m2=jnp.zeros((num_channels,), dtype),
    )


@jax.jit
def welford_update(state: WelfordState, batch: jnp.ndarray) -> WelfordState:
    """Batched Welford update; reduces every axis except the last.

    Matches the reference's update order exactly (delta computed against the
    pre-update mean, delta2 against the post-update mean;
    reference: src/audiofakedetect/data_loader.py:41-63).
    """
    axes = tuple(range(batch.ndim - 1))
    n_new = jnp.asarray(
        jnp.prod(jnp.asarray(batch.shape[:-1])), dtype=state.count.dtype
    )
    count = state.count + n_new
    delta = batch - state.mean
    mean = state.mean + jnp.sum(delta / count, axis=axes)
    delta2 = batch - mean
    m2 = state.m2 + jnp.sum(delta * delta2, axis=axes)
    return WelfordState(count, mean, m2)


def welford_finalize(state: WelfordState):
    """Return (mean, std); std = sqrt(m2 / count) (population convention)."""
    return state.mean, jnp.sqrt(state.m2 / state.count)


def normalize(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """Per-channel ``(x - mean) / std`` on ``[B, C, ...]`` images.

    Equivalent to ``torchvision.transforms.Normalize`` on NCHW input; the
    channel axis is axis 1.
    """
    mean = jnp.asarray(mean, x.dtype).reshape(1, -1, *([1] * (x.ndim - 2)))
    std = jnp.asarray(std, x.dtype).reshape(1, -1, *([1] * (x.ndim - 2)))
    return (x - mean) / std
