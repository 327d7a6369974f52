"""Fused first-layer block: conv2d(1->C, 3x3, pad 2) + PReLU + maxpool 2x2.

The DCNN's first layer dominates HBM traffic: its pre-pool activation is
``[B, H+2, W+2, 64]`` (~410 MB at batch 128 bf16), written by the conv,
re-read by PReLU and the pool, and again in the backward.  This kernel keeps
that activation strictly in VMEM: one pass reads the phase-decomposed input
image (~12 MB) and writes only the pooled output (~100 MB).

Mosaic-driven design (several simpler formulations are rejected by the TPU
lowering: >2-D strided gathers, minor-dim-inserting reshapes/broadcasts,
sub-32-bit scalar extracts):

* **Phase decomposition.**  The input is pre-split in XLA into its four
  parity phases ``x[a::2, b::2]``; every pool-window position then reads 9
  contiguous slices — no strided access in-kernel.
* **Tap planes + per-row MXU dots over a pipelined grid.**  The 4x9 conv
  window planes are materialized once per image into VMEM scratch (a direct
  sublane-concat of window rows is rejected: "offset mismatch on non-concat
  dimension"), then a (batch, row-block) GRID — which Mosaic pipelines,
  unlike an in-kernel ``fori_loop`` — computes each phase's conv row as ONE
  matmul ``w [C, 9] @ P [9, w2]`` and pools across phases.  The output
  layout is ``[B, h2, C, w2]`` so a row write is a leading-index store; the
  caller transposes to NHWC (cheap in XLA).  Planes stay f32: bf16 scratch
  demands 8-aligned dynamic sublane indices, as do per-cell plane builds.
* **Compact custom VJP.**  The layer input comes from the (stop-gradient)
  transform, so no input gradient is needed — only ``dW [9, C]``, ``db [C]``
  and ``dalpha [1]``.  The backward recomputes the conv rows in VMEM and
  carries the small gradient accumulators through the row loop, with
  first-match pool tie-breaking identical to the forward's nested maximum.

Used by ``DCNN(fused_layer1=True)``; numerics match the unfused XLA path to
fp32 roundoff (compute is fp32 in-kernel regardless of storage dtype).
Tests run the kernel in interpreter mode on CPU.

STATUS — experimental, off by default.  Measured train-step series on v5e
(batch 128): round-1 rank-1 VPU MACs 33.9 ms vs 16.6 XLA; round-2 MXU dots
+ fori_loop 15.35 ms; round-2 final (grid-pipelined row blocks) **14.45 ms
vs 13.8 XLA** — 2.3x faster than round 1, 0.65 ms short of XLA's schedule.
Remaining gap: 192 tiny [64,9]x[9,129] dots per image are
fixed-overhead-bound and the 129-lane tiles waste half the lane tile; a
winning version must batch rows into each dot's N dimension, which needs a
lane-major flattening Mosaic currently rejects (and per-cell plane builds /
bf16 scratch hit the 8-aligned-dynamic-sublane-index constraint).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 2  # torch Conv2d(1, C, 3, stride=1, padding=2) — zero padding
K = 3
_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def _pad_geometry(h: int, w: int) -> Tuple[int, int]:
    h_out, w_out = h + 2 * PAD - K + 1, w + 2 * PAD - K + 1
    return h_out // 2, w_out // 2  # pooled (floor) output


def _phases(x: jnp.ndarray, h2: int, w2: int) -> jnp.ndarray:
    """``[B, H, W] -> [B, 2, 2, h2+2, w2+2]`` zero-padded parity phases."""
    b, h, w = x.shape
    x_pad = jnp.pad(
        x, ((0, 0), (PAD, 2 * h2 + 4 - h - PAD), (PAD, 2 * w2 + 4 - w - PAD))
    ).astype(jnp.float32)  # f32 planes: bf16 scratch would need 8-aligned
    # dynamic sublane indices ("cannot statically prove index in dim 2 is a
    # multiple of 8"); 32-bit lifts that constraint
    return jnp.stack(
        [
            jnp.stack([x_pad[:, 0::2, 0::2], x_pad[:, 0::2, 1::2]], axis=1),
            jnp.stack([x_pad[:, 1::2, 0::2], x_pad[:, 1::2, 1::2]], axis=1),
        ],
        axis=1,
    )  # [B, a, b, h2+2, w2+2]


def _build_tap_planes(xph_ref, p_ref, h2, w2):
    """Copy the 4x9 conv tap planes into scratch, layout-normalized.

    ``p_ref``: [4, 16, h2, w2] VMEM scratch (taps 0-8 used; phases indexed
    by ``_PHASES`` order).  A direct sublane-concat of the 9 window rows is
    rejected by Mosaic ("offset mismatch on non-concat dimension": the
    slices carry different lane offsets), and per-cell builds need dynamic
    sublane starts Mosaic cannot prove 8-aligned — so the planes are
    materialized once per image (first row-block cell) through 36 static
    2-D copies; row-steps then read clean [9, 1, w2] blocks.
    """
    for ph, (a, b) in enumerate(_PHASES):
        for dh in range(K):
            for dw in range(K):
                oh, ow = a + dh, b + dw
                p_ref[ph, dh * K + dw] = xph_ref[
                    0, oh % 2, ow % 2,
                    (oh // 2) : (oh // 2) + h2,
                    (ow // 2) : (ow // 2) + w2,
                ]


def _conv_row(p_ref, wt, bias_col, h, phase_idx, w2, c):
    """Conv row at output row ``h`` for phase ``phase_idx``: ``[C, w2]``.

    One MXU matmul ``w [C, 9] @ P [9, w2]`` per phase-row instead of nine
    rank-1 VPU MACs (the round-1 kernel's bottleneck).  ``wt``: [C, 16]
    transposed taps (taps 0-8 used); ``bias_col``: [C, 1].
    """
    patches = p_ref[phase_idx, 0:9, pl.ds(h, 1), :].reshape(9, w2)
    conv = jax.lax.dot_general(
        wt[:, :9],
        patches,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, w2]
    return conv + bias_col, patches


def _rows_per_cell(h2: int) -> int:
    for r in (8, 6, 4, 3, 2):
        if h2 % r == 0:
            return r
    return 1


def _fwd_kernel(xph_ref, wt_ref, b_ref, alpha_ref, out_ref, p_ref):
    """Grid = (batch, row-blocks): Mosaic pipelines grid cells (overlapped
    DMA/compute), unlike a serial in-kernel ``fori_loop`` over rows."""
    rows, c, w2 = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    h2 = p_ref.shape[2]
    hb = pl.program_id(1)
    alpha = alpha_ref[0, 0]

    @pl.when(hb == 0)
    def _():
        _build_tap_planes(xph_ref, p_ref, h2, w2)

    wt = wt_ref[...]
    bias_col = b_ref[...]
    for r in range(rows):
        h = hb * rows + r
        pooled = None
        for ph in range(len(_PHASES)):
            conv, _ = _conv_row(p_ref, wt, bias_col, h, ph, w2, c)
            act = jnp.where(conv >= 0, conv, alpha * conv)
            pooled = act if pooled is None else jnp.maximum(pooled, act)
        out_ref[0, r] = pooled.astype(out_ref.dtype)


def _bwd_kernel(
    xph_ref, wt_ref, b_ref, alpha_ref, g_ref, dwt_ref, db_ref, da_ref, p_ref
):
    i, hb = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, hb == 0))
    def _():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        da_ref[0, 0] = 0.0  # SMEM: scalar stores only

    rows, c, w2 = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    h2 = p_ref.shape[2]
    alpha = alpha_ref[0, 0]
    wt = wt_ref[...]
    bias_col = b_ref[...]

    @pl.when(hb == 0)
    def _():
        _build_tap_planes(xph_ref, p_ref, h2, w2)

    # [C, 9] kernel-grad accumulator (one MXU dot per phase-row:
    # d_conv [C, w2] contracted with patches [9, w2] over w2)
    dk_acc = jnp.zeros((c, 9), jnp.float32)
    db_acc = jnp.zeros((c, 1), jnp.float32)
    da_acc = jnp.zeros((), jnp.float32)
    for r in range(rows):
        h = hb * rows + r
        g = g_ref[0, r].astype(jnp.float32)  # [C, w2]
        convs = []
        acts = []
        patches = []
        for ph in range(len(_PHASES)):
            conv, p = _conv_row(p_ref, wt, bias_col, h, ph, w2, c)
            patches.append(p)
            convs.append(conv)
            acts.append(jnp.where(conv >= 0, conv, alpha * conv))
        m = jnp.maximum(
            jnp.maximum(acts[0], acts[1]), jnp.maximum(acts[2], acts[3])
        )
        taken = None
        for idx in range(len(_PHASES)):
            is_max = acts[idx] == m
            if taken is None:
                sel = is_max
                taken = is_max
            else:
                sel = jnp.logical_and(is_max, jnp.logical_not(taken))
                taken = jnp.logical_or(taken, is_max)
            d_act = jnp.where(sel, g, 0.0)
            neg = convs[idx] < 0
            d_conv = jnp.where(neg, alpha * d_act, d_act)  # [C, w2]
            da_acc = da_acc + jnp.sum(jnp.where(neg, convs[idx] * d_act, 0.0))
            db_acc = db_acc + jnp.sum(d_conv, axis=1, keepdims=True)
            dk_acc = dk_acc + jax.lax.dot_general(
                d_conv,
                patches[idx],
                (((1,), (1,)), ((), ())),  # contract w2 with w2 -> [C, 9]
                preferred_element_type=jnp.float32,
            )
    dwt_ref[:, :9] += dk_acc
    db_ref[...] += db_acc
    da_ref[0, 0] += da_acc


@jax.custom_vjp
def fused_conv1_prelu_pool(x, w, b, alpha):
    """``[B, H, W] x [9, C] x [C] x [1] -> [B, H2, W2, C]`` fused block."""
    return _fused_fwd_impl(x, w, b, alpha)


def _prep_params(w, b, alpha):
    wt = (
        jnp.zeros((w.shape[1], 16), jnp.float32)
        .at[:, :9]
        .set(w.astype(jnp.float32).T)
    )  # [C, 16] lane-padded transposed taps
    bias_col = b.astype(jnp.float32)[:, None]  # [C, 1]
    alpha2 = alpha.astype(jnp.float32).reshape(1, 1)
    return wt, bias_col, alpha2


def _fused_fwd_impl(x, w, b, alpha):
    bsz, h, win = x.shape
    h2, w2 = _pad_geometry(h, win)
    c = w.shape[-1]
    xph = _phases(x, h2, w2)
    wt, bias_col, alpha2 = _prep_params(w, b, alpha)
    interpret = jax.default_backend() != "tpu"
    rows = _rows_per_cell(h2)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, h2 // rows),
        in_specs=[
            pl.BlockSpec(
                (1,) + xph.shape[1:], lambda i, hb: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(wt.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                bias_col.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                alpha2.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, c, w2), lambda i, hb: (i, hb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h2, c, w2), x.dtype),
        scratch_shapes=[pltpu.VMEM((4, 16, h2, w2), jnp.float32)],
        interpret=interpret,
    )(xph, wt, bias_col, alpha2)
    return jnp.transpose(out, (0, 1, 3, 2))  # -> [B, h2, w2, C] (NHWC)


def _fused_fwd(x, w, b, alpha):
    return _fused_fwd_impl(x, w, b, alpha), (x, w, b, alpha)


def _fused_bwd(res, g):
    x, w, b, alpha = res
    bsz, h, win = x.shape
    h2, w2 = _pad_geometry(h, win)
    c = w.shape[-1]
    xph = _phases(x, h2, w2)
    wt, bias_col, alpha2 = _prep_params(w, b, alpha)
    g_t = jnp.transpose(g, (0, 1, 3, 2)).astype(jnp.float32)  # [B, h2, C, w2]
    interpret = jax.default_backend() != "tpu"
    rows = _rows_per_cell(h2)
    dwt, db, da = pl.pallas_call(
        _bwd_kernel,
        grid=(bsz, h2 // rows),
        in_specs=[
            pl.BlockSpec(
                (1,) + xph.shape[1:], lambda i, hb: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(wt.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                bias_col.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                alpha2.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, rows, c, w2), lambda i, hb: (i, hb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((c, 16), lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
            # scalar accumulator lives in SMEM (VMEM cannot store scalars)
            pl.BlockSpec((1, 1), lambda i, hb: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, 16), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((4, 16, h2, w2), jnp.float32)],
        interpret=interpret,
    )(xph, wt, bias_col, alpha2, g_t)
    return (
        jnp.zeros_like(x),  # input grad unused (transform is stop-gradient)
        dwt[:, :9].T.astype(w.dtype),
        db[:, 0].astype(b.dtype),
        da.reshape(alpha.shape).astype(alpha.dtype),
    )


fused_conv1_prelu_pool.defvjp(_fused_fwd, _fused_bwd)


def reference_conv1_prelu_pool(x, w, b, alpha):
    """Unfused XLA reference of the same block (for tests)."""
    bsz, h, win = x.shape
    kern = w.reshape(K, K, 1, -1)
    conv = jax.lax.conv_general_dilated(
        x[..., None],
        kern,
        window_strides=(1, 1),
        padding=[(PAD, PAD), (PAD, PAD)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b[None, None, None, :]
    act = jnp.where(conv >= 0, conv, alpha[0] * conv)
    h_out, w_out = act.shape[1] // 2 * 2, act.shape[2] // 2 * 2
    act = act[:, :h_out, :w_out]
    act = act.reshape(bsz, h_out // 2, 2, w_out // 2, 2, -1)
    return jnp.max(act, axis=(2, 4))
