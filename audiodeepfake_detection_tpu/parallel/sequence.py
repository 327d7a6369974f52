"""Sequence-parallel WPT: shard the time axis over the mesh with halo exchange.

The WPT is embarrassingly parallel across time within a level but strictly
sequential across levels (SURVEY.md §5).  For long clips — the level-14
fingerprint analysis runs over full recordings (reference:
scripts/freq_visual/fingerprints.py:105) — a single chip's HBM and compute
can be the limit, so this module shards the *time* axis across the mesh and
exchanges only the filter halo per level over ICI.

Key observation: with ptwt's padding (padl = (2L-3)//2 left), the
stride-2 output block owned by a time shard depends on exactly ``padl``
samples from its left neighbour and nothing from the right (for even filter
lengths, padl = L-2 and the last owned output touches precisely the last
owned input sample).  So each level needs ONE ``ppermute`` of ``padl``
samples per node — a tiny transfer that rides ICI.

Requirement: the clip length must be divisible by ``shards * 2**level`` so
every level keeps even, aligned local blocks (the fingerprint pipeline
already crops clips to a multiple of ``2**level``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.wavelets import get_wavelet
from ..ops.wpt import _dec_kernel, graycode_permutation


def _sp_dwt_level(x: jnp.ndarray, kernel: jnp.ndarray, axis: str) -> jnp.ndarray:
    """One analysis level on a time shard ``[B, N, n_loc]`` (inside shard_map)."""
    filt_len = kernel.shape[-1]
    padl = (2 * filt_len - 3) // 2
    idx = jax.lax.axis_index(axis)
    size = jax.lax.axis_size(axis)

    # halo: every shard receives the last `padl` samples of its left
    # neighbour; shard 0 replaces the garbage it gets with reflect padding.
    if padl > 0:
        halo = jax.lax.ppermute(
            x[..., -padl:],
            axis,
            [(i, (i + 1) % size) for i in range(size)],
        )
        reflect = x[..., 1 : padl + 1][..., ::-1]
        halo = jnp.where(idx == 0, reflect, halo)
        x_ext = jnp.concatenate([halo, x], axis=-1)
    else:
        x_ext = x

    # VALID conv over [padl + m] yields exactly m/2 outputs per shard: the
    # window of the last owned output ends on the last owned input sample.
    # ptwt additionally emits padl/2 boundary outputs from the right reflect
    # pad; the time-sharded transform truncates those (exact for haar where
    # padl == 0 — the fingerprint wavelet; a vanishing trailing region for
    # longer filters).
    b, nodes, n_ext = x_ext.shape
    y = jax.lax.conv_general_dilated(
        x_ext.reshape(b * nodes, 1, n_ext),
        kernel,
        window_strides=(2,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    n_out = x.shape[-1] // 2
    return y.reshape(b, 2 * nodes, n_out)


@functools.partial(
    jax.jit, static_argnames=("wavelet_name", "level", "axis", "mesh")
)
def sp_wpt_analysis(
    x: jnp.ndarray,
    wavelet_name: str,
    level: int,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Time-sharded WPT over ``mesh``: ``[B, T] -> [B, 2**level, T/2**level]``.

    ``T`` must be divisible by ``mesh.shape[axis] * 2**level``.  Node order
    is the Gray-code frequency order, identical to
    :func:`~audiodeepfake_detection_tpu.ops.wpt.wpt_analysis`.
    """
    shards = mesh.shape[axis]
    t = x.shape[-1]
    assert t % (shards * 2**level) == 0, (
        f"clip length {t} must divide by shards*2**level = {shards * 2**level}"
    )
    wavelet = get_wavelet(wavelet_name)
    kernel = _dec_kernel(wavelet, x.dtype)

    def local_cascade(x_local):
        y = x_local[:, None, :]
        for _ in range(level):
            y = _sp_dwt_level(y, kernel, axis)
        return y

    from jax import shard_map

    fn = shard_map(
        local_cascade,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, None, axis),
        check_vma=False,
    )
    y = fn(x)
    return y[:, np.asarray(graycode_permutation(level)), :]
