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
* **Tap planes + per-row MXU dots.**  The 4x9 conv window planes are
  materialized once per image into VMEM scratch (a direct sublane-concat of
  window rows is rejected: "offset mismatch on non-concat dimension"), then
  a ``fori_loop`` walks output rows computing each phase's conv row as ONE
  matmul ``w [C, 9] @ P [9, w2]`` and pooling across phases, 4-row
  unrolled for ILP.  The output layout is ``[B, h2, C, w2]`` so a row write
  is a leading-index store; the caller transposes to NHWC (cheap in XLA).
  Planes stay f32: bf16 scratch demands 8-aligned dynamic sublane indices.
* **Compact custom VJP.**  The layer input comes from the (stop-gradient)
  transform, so no input gradient is needed — only ``dW [9, C]``, ``db [C]``
  and ``dalpha [1]``.  The backward recomputes the conv rows in VMEM and
  carries the small gradient accumulators through the row loop, with
  first-match pool tie-breaking identical to the forward's nested maximum.

Used by ``DCNN(fused_layer1=True)``; numerics match the unfused XLA path to
fp32 roundoff (compute is fp32 in-kernel regardless of storage dtype).
Tests run the kernel in interpreter mode on CPU.

STATUS — experimental, off by default.  Round-1 version (rank-1 VPU MACs):
33.9 ms/step vs 16.6 XLA.  Round-2 rework (MXU dots + tap-plane scratch +
4-row unroll): **15.35 ms/step vs 13.8 XLA** — 2.2x faster than round 1 but
still behind XLA's schedule: 192 tiny [64,9]x[9,129] dots per image are
fixed-overhead-bound, and the [*,129]-lane tiles waste half the lane tile.
To win, a future revision must batch rows into each dot's N dimension,
which requires a lane-major flattening Mosaic currently rejects.
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
    slices carry different lane offsets), so the planes are materialized
    once per image through stores — 36 static 2-D copies — and every
    row-step then reads a clean [9, 1, w2] block.
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


def _fwd_kernel(xph_ref, wt_ref, b_ref, alpha_ref, out_ref, p_ref):
    h2, c, w2 = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    alpha = alpha_ref[0, 0]
    _build_tap_planes(xph_ref, p_ref, h2, w2)
    wt = wt_ref[...]
    bias_col = b_ref[...]

    # 4-row unroll: 16 independent dots per loop step give the scheduler
    # ILP that a single-row body lacks (h2 = 48 is divisible by 4)
    unroll = 4 if h2 % 4 == 0 else 1

    def row_block(hb, carry):
        for r in range(unroll):
            h = hb * unroll + r
            pooled = None
            for ph in range(len(_PHASES)):
                conv, _ = _conv_row(p_ref, wt, bias_col, h, ph, w2, c)
                act = jnp.where(conv >= 0, conv, alpha * conv)
                pooled = act if pooled is None else jnp.maximum(pooled, act)
            out_ref[0, pl.ds(h, 1)] = pooled.reshape(1, c, w2).astype(
                out_ref.dtype
            )
        return carry

    jax.lax.fori_loop(0, h2 // unroll, row_block, 0)


def _bwd_kernel(
    xph_ref, wt_ref, b_ref, alpha_ref, g_ref, dwt_ref, db_ref, da_ref, p_ref
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        da_ref[0, 0] = 0.0  # SMEM: scalar stores only

    h2, c, w2 = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    alpha = alpha_ref[0, 0]
    wt = wt_ref[...]
    bias_col = b_ref[...]
    _build_tap_planes(xph_ref, p_ref, h2, w2)

    def row(h, carry):
        # [C, 9] kernel-grad accumulator (one MXU dot per phase-row:
        # d_conv [C, w2] contracted with patches [9, w2] over w2)
        dk_acc, db_acc, da_acc = carry
        g = g_ref[0, pl.ds(h, 1)].reshape(c, w2).astype(jnp.float32)
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
        return dk_acc, db_acc, da_acc

    dk_acc, db_acc, da_acc = jax.lax.fori_loop(
        0,
        h2,
        row,
        (
            jnp.zeros((c, 9), jnp.float32),
            jnp.zeros((c, 1), jnp.float32),
            jnp.zeros((), jnp.float32),
        ),
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
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(
                (1,) + xph.shape[1:], lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                bias_col.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                alpha2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h2, c, w2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
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
    dwt, db, da = pl.pallas_call(
        _bwd_kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(
                (1,) + xph.shape[1:], lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                bias_col.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                alpha2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, h2, c, w2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((c, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            # scalar accumulator lives in SMEM (VMEM cannot store scalars)
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
