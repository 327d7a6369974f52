"""Sequence-parallel WPT: shard the time axis over the mesh with halo exchange.

The WPT is embarrassingly parallel across time within a level but strictly
sequential across levels (SURVEY.md §5).  For long clips — the level-14
fingerprint analysis runs over full recordings (reference:
scripts/freq_visual/fingerprints.py:105) — a single chip's HBM and compute
can be the limit, so this module shards the *time* axis across the mesh and
exchanges only the filter halo per level over ICI.

Exactness (all wavelets): with ptwt's padding (padl = (2L-3)//2 left,
padr = padl + (n % 2) right, reference wavelet_math.py:182-204 length
semantics), each level's output splits into

* an *interior* block of ``m/2`` coefficients per shard, whose stride-2
  windows touch only the shard's own samples plus ``padl`` halo samples
  from the left neighbour (one tiny ``ppermute`` per level over ICI); and
* a *boundary tail* of ``tail' = (tail + L - 1)//2`` coefficients produced
  by the right reflect padding, which depends only on the signal's global
  right edge — so it is computed locally on the LAST shard, which holds
  that edge.

Every shard therefore carries ``[B, N, m + tail]`` per level where the
trailing ``tail`` columns are meaningful only on the last shard (garbage
elsewhere, never read by interiors: the next level's halo is sliced from
the interior end).  ``tail`` follows the fixed-point recursion above and
converges to ``L - 2`` — a handful of columns, statically known per level
because the level loop is a Python loop.  The final output stitches the
all-shard interiors with the last shard's tail and equals
:func:`~audiodeepfake_detection_tpu.ops.wpt.wpt_analysis` to fp32 roundoff
for every wavelet (haar's ``padl == 0`` degenerates to the halo-free case).

Requirement: the clip length must be divisible by ``shards * 2**level`` so
every level keeps even, aligned local blocks (the fingerprint pipeline
already crops clips to a multiple of ``2**level``), and local blocks must
stay longer than the filter halo at the deepest level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.wavelets import get_wavelet
from ..ops.wpt import _dec_kernel, graycode_permutation


def sp_wpt_min_len(wavelet_name: str, level: int, shards: int) -> int:
    """Smallest aligned clip length ``sp_wpt_analysis`` accepts.

    Combines BOTH of its preconditions (divisibility by
    ``shards * 2**level`` and per-shard interiors longer than the filter
    overhang at the deepest level) — callers choosing between the
    sharded and dense cascades (analysis/fingerprints.py) should crop to
    a multiple of ``shards * 2**level`` and compare against this, so the
    eligibility rule lives in one place.
    """
    filt_len = len(get_wavelet(wavelet_name).dec_lo)
    padl = (2 * filt_len - 3) // 2
    block = shards * 2**level
    # need 2 * (t // block) >= padl + 1 with t a multiple of block
    blocks = max(1, -(-(padl + 1) // 2))
    return blocks * block


def _sp_dwt_level(
    x: jnp.ndarray, kernel: jnp.ndarray, axis: str, m: int, g: int, shards: int
) -> jnp.ndarray:
    """One analysis level on a time shard ``[B, N, m + tail]`` (in shard_map).

    ``m`` is the per-shard interior length, ``g`` the global dense (ptwt)
    length at this level; ``tail = g - shards*m`` trailing columns are valid
    only on the last shard.  Returns ``[B, 2N, m/2 + tail']`` with
    ``tail' = (tail + L - 1)//2``.
    """
    filt_len = kernel.shape[-1]
    padl = (2 * filt_len - 3) // 2
    tail = g - shards * m
    padr = padl + (g % 2)
    idx = jax.lax.axis_index(axis)
    size = jax.lax.axis_size(axis)

    parts = []
    if padl > 0:
        # halo: every shard receives the last `padl` INTERIOR samples of its
        # left neighbour (the tail columns sit to the right of the last
        # shard's interior, i.e. past the global end — never part of a halo);
        # shard 0 replaces the garbage it gets with reflect padding.
        halo = jax.lax.ppermute(
            x[..., m - padl : m],
            axis,
            [(i, (i + 1) % size) for i in range(size)],
        )
        reflect = x[..., 1 : padl + 1][..., ::-1]
        halo = jnp.where(idx == 0, reflect, halo)
        parts.append(halo)
    parts.append(x)
    if padr > 0:
        # right reflect pad of the global signal: meaningful on the last
        # shard only, whose local array ends exactly at the global end.
        n_loc = m + tail
        rpad = x[..., n_loc - 1 - padr : n_loc - 1][..., ::-1]
        parts.append(rpad)
    x_ext = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x

    # One VALID conv over [padl + m + tail + padr] yields exactly
    # m/2 interior outputs followed by tail' boundary outputs: the window of
    # the last output ends on the last right-pad sample (parity arithmetic:
    # padl = L-2 and padr = L-2 + tail%2 make the count land exactly).
    b, nodes, n_ext = x_ext.shape
    y = jax.lax.conv_general_dilated(
        x_ext.reshape(b * nodes, 1, n_ext),
        kernel,
        window_strides=(2,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    n_out = m // 2 + (tail + filt_len - 1) // 2
    assert y.shape[-1] == n_out, (y.shape, m, tail, filt_len)
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
    """Time-sharded WPT over ``mesh``: ``[B, T] -> [B, 2**level, n_level]``.

    ``T`` must be divisible by ``mesh.shape[axis] * 2**level``.  Node order
    is the Gray-code frequency order and ``n_level`` the pywt length rule
    ``n' = (n + L - 1)//2`` applied ``level`` times — the output is a
    drop-in equal (to fp32 roundoff) of
    :func:`~audiodeepfake_detection_tpu.ops.wpt.wpt_analysis` for every
    supported wavelet, boundary coefficients included.
    """
    shards = mesh.shape[axis]
    t = x.shape[-1]
    assert t % (shards * 2**level) == 0, (
        f"clip length {t} must divide by shards*2**level = {shards * 2**level}"
    )
    wavelet = get_wavelet(wavelet_name)
    kernel = _dec_kernel(wavelet, x.dtype)
    filt_len = int(kernel.shape[-1])
    padl = (2 * filt_len - 3) // 2
    # the deepest level's halo/reflect slices need local interiors longer
    # than the filter overhang
    assert 2 * (t // (shards * 2**level)) >= padl + 1, (
        f"per-shard block too short for {wavelet_name} at level {level}: "
        f"need T >= shards * 2**(level-1) * {padl + 1}"
    )

    def local_cascade(x_local):
        y = x_local[:, None, :]
        m, g = t // shards, t
        for _ in range(level):
            y = _sp_dwt_level(y, kernel, axis, m, g, shards)
            m, g = m // 2, (g + filt_len - 1) // 2
        tail = y[..., m:]
        if tail.shape[-1]:
            # replicate ONLY the last shard's tail (the true global
            # boundary): a psum of a masked <=L-2-column block over ICI,
            # instead of gathering every shard's garbage tail and slicing
            idx = jax.lax.axis_index(axis)
            size = jax.lax.axis_size(axis)
            tail = jax.lax.psum(
                jnp.where(idx == size - 1, tail, jnp.zeros_like(tail)), axis
            )
        return y[..., :m], tail

    from jax import shard_map

    fn = shard_map(
        local_cascade,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=(P(None, None, axis), P(None, None, None)),
        check_vma=False,
    )
    interior, tail = fn(x)
    y = (
        jnp.concatenate([interior, tail], axis=-1)
        if tail.shape[-1]
        else interior
    )
    return y[:, np.asarray(graycode_permutation(level)), :]
