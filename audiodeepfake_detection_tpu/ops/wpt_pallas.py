"""Fused wavelet-packet transform as a single Pallas TPU kernel.

The XLA cascade in ``wpt.py`` issues one strided convolution per level (8
HLOs + reshapes for the training config).  This kernel runs the whole
cascade in VMEM in one ``pallas_call`` and feeds the MXU instead of the VPU:

* **Levels as banded matmuls.**  A stride-2 filter-pair level is expressed
  per 128-output chunk as ``window [R, W] @ M [W, 256]`` where ``M`` is a
  static banded matrix holding both the low- and high-pass taps
  (columns 0-127 = low outputs, 128-255 = high outputs).  The MXU does
  128x128 systolic matmuls at full rate; the band structure costs density
  but the whole 8-level transform is ~3 GFLOP per 32-sample tile — tens of
  microseconds.
* **Reflect padding folded into the matrices.**  Edge chunks use dedicated
  first/last matrices whose rows re-route out-of-range taps to their
  whole-point reflections, so the kernel performs no explicit padding, no
  lane reversals and no strided slices (ptwt boundary semantics:
  ``padl = (2L-3)//2``, ``padr = padl + (n&1)``, reference
  src/audiofakedetect/wavelet_math.py:182).
* **Concat node layout.**  Each level writes all low-pass nodes above all
  high-pass nodes (two contiguous block writes, no interleaving); the final
  node order is the bit-reversed natural order, fixed up by one XLA gather
  composed with the Gray-code (frequency) permutation.
* The final ``log(|x|**power + 1e-12)`` is fused into the kernel.

Numerics match ``wpt.py``'s cascade to fp32 roundoff (same taps, same
boundary rule, matmul accumulation in fp32).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavelets import get_wavelet
from .wpt import graycode_permutation

_CHUNK = 128


def _level_plan(n_in: int, filt_len: int) -> Tuple[int, int, int]:
    """(n_out, num_chunks, window_width) for one level."""
    n_out = (n_in + filt_len - 1) // 2
    chunks = -(-n_out // _CHUNK)
    width = 2 * (_CHUNK - 1) + filt_len  # input span of one full chunk
    return n_out, chunks, width


def _reflect(t: int, n: int) -> int:
    """Whole-point reflection of index ``t`` into [0, n)."""
    while t < 0 or t >= n:
        if t < 0:
            t = -t
        if t >= n:
            t = 2 * (n - 1) - t
    return t


def _chunk_matrix(
    n_in: int,
    n_out: int,
    filt_len: int,
    dec_lo: np.ndarray,
    dec_hi: np.ndarray,
    chunk: int,
    window_start: int,
    width: int,
) -> np.ndarray:
    """Banded matrix [width, 256] for one output chunk.

    Output ``s = 128*chunk + j`` is ``sum_k x[2s + k - padl] * f[k]`` with
    reflected out-of-range indices; taps are flipped dec filters
    (correlation == convolution with dec filters, matching ptwt).
    """
    padl = (2 * filt_len - 3) // 2
    flo = dec_lo[::-1]
    fhi = dec_hi[::-1]
    m = np.zeros((width, 2 * _CHUNK), dtype=np.float64)
    for j in range(_CHUNK):
        s = _CHUNK * chunk + j
        if s >= n_out:
            break
        for k in range(filt_len):
            t = _reflect(2 * s + k - padl, n_in)
            local = t - window_start
            assert 0 <= local < width, (s, k, t, window_start, width)
            m[local, j] += flo[k]
            m[local, j + _CHUNK] += fhi[k]
    return m


@functools.lru_cache(maxsize=16)
def _build_plan(wavelet_name: str, t: int, level: int):
    """Static plan: per-level lengths, chunk schedules and matrices."""
    wavelet = get_wavelet(wavelet_name)
    filt_len = wavelet.dec_len
    dec_lo = np.asarray(wavelet.dec_lo, dtype=np.float64)
    dec_hi = np.asarray(wavelet.dec_hi, dtype=np.float64)
    padl = (2 * filt_len - 3) // 2

    n = t
    lengths = [t]
    schedules = []  # per level: list of (window_start, matrix_index)
    matrices: List[np.ndarray] = []
    mat_index: dict = {}  # dedup: all mid chunks of a level share one matrix
    width_global = 2 * (_CHUNK - 1) + filt_len
    for _ in range(level):
        n_out, chunks, width = _level_plan(n, filt_len)
        sched = []
        for c in range(chunks):
            raw_start = 2 * _CHUNK * c - padl
            w_start = min(max(raw_start, 0), max(n - width, 0))
            m = _chunk_matrix(
                n, n_out, filt_len, dec_lo, dec_hi, c, w_start, width
            )
            key = m.tobytes()
            if key not in mat_index:
                mat_index[key] = len(matrices)
                matrices.append(m)
            sched.append((w_start, mat_index[key]))
        schedules.append(sched)
        lengths.append(n_out)
        n = n_out

    # pad buffers: lanes multiple of 128, wide enough for every window read
    padded = []
    for lvl, n_l in enumerate(lengths):
        need = -(-n_l // _CHUNK) * _CHUNK
        if lvl < level:
            need = max(need, max(ws for ws, _ in schedules[lvl]) + width_global)
        padded.append(need)

    mats = np.stack(matrices).astype(np.float32)  # [num_mats, width, 256]
    return lengths, padded, schedules, mats, width_global


def _group_schedule(sched, rows):
    """Batch consecutive same-matrix chunks into groups of <= 128//rows.

    Early levels have few buffer rows (b_tile * 2**lvl = 16..64 for the
    training config), so a per-chunk dot runs the MXU at 12-50% M
    utilization.  All mid chunks of a level share one banded matrix, so up
    to ``128 // rows`` of them can stack along sublanes into ONE full-M
    dot (measured: the kernel is dominated by these underfilled early
    levels).  Edge chunks have dedicated matrices and stay single.
    """
    cap = max(1, _CHUNK // rows)
    groups = []
    cur = []
    for c, (ws, mi) in enumerate(sched):
        if cur and (mi != cur[0][2] or len(cur) == cap):
            groups.append(cur)
            cur = []
        cur.append((c, ws, mi))
    if cur:
        groups.append(cur)
    return groups


def _wpt_kernel_factory(level, lengths, padded, schedules, width, b_tile,
                        log_scale, power, precision):
    def kernel(x_ref, mats_ref, out_ref, *scratch):
        stack_ref = scratch[-1]
        bufs = list(scratch[:-1]) + [out_ref]
        # zero only the regions the level writes never cover: the chunk
        # writes fill all rows and all chunk columns (matrix columns past
        # n_out are structurally zero), so just the window-padding tail
        # lanes need clearing (a full-buffer zero-fill measured ~13 MB of
        # pure VPU writes per tile)
        for lvl, buf in enumerate(bufs):
            if lvl == 0:
                if padded[0] > lengths[0]:
                    buf[:, lengths[0] :] = jnp.zeros(
                        (buf.shape[0], padded[0] - lengths[0]), jnp.float32
                    )
            else:
                covered = len(schedules[lvl - 1]) * _CHUNK
                if padded[lvl] > covered:
                    buf[:, covered:] = jnp.zeros(
                        (buf.shape[0], padded[lvl] - covered), jnp.float32
                    )
        bufs[0][:, : lengths[0]] = x_ref[...]
        for lvl in range(level):
            src = bufs[lvl]
            dst = bufs[lvl + 1]
            rows = b_tile * (2**lvl)
            for grp in _group_schedule(schedules[lvl], rows):
                if len(grp) == 1:
                    _, w_start, m_idx = grp[0]
                    window = src[:, w_start : w_start + width]
                else:
                    # stack same-matrix windows along sublanes -> full-M dot
                    for gi, (_, ws, _) in enumerate(grp):
                        stack_ref[gi * rows : (gi + 1) * rows, :] = src[
                            :, ws : ws + width
                        ]
                    m_idx = grp[0][2]
                    window = stack_ref[0 : len(grp) * rows, :]
                y = jnp.dot(
                    window,
                    mats_ref[m_idx],
                    preferred_element_type=jnp.float32,
                    # Mosaic's default f32 matmul runs the MXU in one bf16
                    # pass (~1% relative error measured on v5e); the
                    # multi-pass precisions restore the fp32-exact contract
                    precision=precision,
                )
                for gi, (c, _, _) in enumerate(grp):
                    col = _CHUNK * c
                    ys = y[gi * rows : (gi + 1) * rows]
                    dst[0:rows, col : col + _CHUNK] = ys[:, :_CHUNK]
                    dst[rows : 2 * rows, col : col + _CHUNK] = ys[:, _CHUNK:]
        if log_scale:
            out_ref[...] = jnp.log(
                jnp.abs(out_ref[...]) ** power + 1e-12
            )

    return kernel


def pallas_node_permutation(level: int) -> np.ndarray:
    """freq-order index -> kernel buffer row-block index.

    Buffer blocks are in bit-reversed natural order (concat layout); compose
    bit-reversal with the Gray-code map.
    """
    def bitrev(v: int) -> int:
        r = 0
        for _ in range(level):
            r = (r << 1) | (v & 1)
            v >>= 1
        return r

    gray = graycode_permutation(level)
    return np.asarray([bitrev(int(g)) for g in gray])


@functools.partial(
    jax.jit,
    static_argnames=(
        "wavelet_name", "level", "log_scale", "power", "b_tile", "precision",
    ),
)
def wpt_packets_pallas(
    x: jnp.ndarray,
    wavelet_name: str,
    level: int = 8,
    log_scale: bool = False,
    power: float = 2.0,
    b_tile: int = 16,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Fused WPT: ``[B, T] -> [B, 2**level, n_level]`` (freq order).

    Drop-in accelerated equivalent of
    ``wpt.wpt_analysis`` (+ optional fused log scaling).  ``B`` must be a
    multiple of ``b_tile``.
    """
    b, t = x.shape
    if b % b_tile != 0:
        pad = b_tile - b % b_tile
        x = jnp.concatenate([x, jnp.zeros((pad, t), x.dtype)], axis=0)
    lengths, padded, schedules, mats, width = _build_plan(wavelet_name, t, level)
    n_out = lengths[level]
    rows_out = b_tile * (2**level)

    scratch = [
        pltpu.VMEM((b_tile * (2**lvl), padded[lvl]), jnp.float32)
        for lvl in range(level)
    ]
    # sublane-stacking buffer for grouped same-matrix dots (see
    # _group_schedule): holds up to 128 rows of window data
    scratch.append(pltpu.VMEM((_CHUNK, width), jnp.float32))
    kernel = _wpt_kernel_factory(
        level, lengths, padded, schedules, width, b_tile, log_scale, power,
        precision,
    )
    grid = (x.shape[0] // b_tile,)
    # off-TPU (tests, CPU dev) run the kernel in interpreter mode
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((b_tile, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (mats.shape[0], width, 2 * _CHUNK),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows_out, padded[level]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (x.shape[0] * (2**level), padded[level]), jnp.float32
        ),
        scratch_shapes=scratch,
        # the level buffers + matrices sit right at Mosaic's 16 MB default
        # scoped-VMEM budget for the training config (b_tile=16, 1 s
        # audio); the sublane-stacking scratch tips it over.  v5e has
        # 128 MB VMEM per core — raise the cap instead of shrinking tiles.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(x, jnp.asarray(mats))
    # out rows: [tile, node_block(bitrev-order), sample] -> [B, nodes, n]
    tiles = x.shape[0] // b_tile
    out = out.reshape(tiles, 2**level, b_tile, padded[level])
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(
        x.shape[0], 2**level, padded[level]
    )
    out = out[:b, pallas_node_permutation(level), :n_out]
    return out
