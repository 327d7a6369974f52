"""Fused first-layer block: conv2d(1->C, 3x3, pad 2) + PReLU + maxpool 2x2.

The DCNN's first layer dominates HBM traffic: its pre-pool activation is
``[B, H+2, W+2, 64]`` (~410 MB at batch 128 bf16), written by the conv,
re-read by PReLU and the pool, and again in the backward.  This kernel keeps
that activation strictly in VMEM: one pass reads the phase-decomposed input
image (~12 MB) and writes only the pooled output (~100 MB).

Design notes:

* **Phase decomposition instead of strided ops.**  Mosaic supports neither
  >2-D strided gathers nor stride-2 windows in-kernel, so the input is
  pre-split (in XLA, where strided slicing is free) into its four parity
  phases ``x[a::2, b::2]``.  Each pool-window position (a, b) then gets its
  conv output from 9 *static* slices of the phase arrays — the pooled max
  and the PReLU never materialize the full-resolution activation.
* **Compact custom VJP.**  The layer input comes from the (stop-gradient)
  transform, so no input gradient is needed — only ``dW [9, C]``,
  ``db [C]`` and ``dalpha [1]``, which are small reductions.  The backward
  *recomputes* the conv phases in VMEM (cheap FLOPs beat saving masks) and
  accumulates the gradients across the sequential TPU grid into revisited
  output blocks, with first-match tie-breaking identical to the forward's
  nested ``maximum``.
* The 1-input-channel 3x3 conv runs as 9 shifted multiply-adds on the VPU
  (an MXU matmul would have 9/128 contraction density).

Used by ``DCNN(fused_layer1=True)``; numerics match the unfused XLA path to
fp32 roundoff (tests run the kernel in interpreter mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 2  # torch Conv2d(1, C, 3, stride=1, padding=2) — zero padding
K = 3


def _pad_geometry(h: int, w: int) -> Tuple[int, int]:
    h_out, w_out = h + 2 * PAD - K + 1, w + 2 * PAD - K + 1
    return h_out // 2, w_out // 2  # pooled (floor) output


def _phases(x: jnp.ndarray, h2: int, w2: int) -> jnp.ndarray:
    """``[B, H, W] -> [B, 2, 2, h2+2, w2+2]`` zero-padded parity phases."""
    b, h, w = x.shape
    x_pad = jnp.pad(
        x, ((0, 0), (PAD, 2 * h2 + 4 - h - PAD), (PAD, 2 * w2 + 4 - w - PAD))
    )
    ph = jnp.stack(
        [
            jnp.stack([x_pad[:, 0::2, 0::2], x_pad[:, 0::2, 1::2]], axis=1),
            jnp.stack([x_pad[:, 1::2, 0::2], x_pad[:, 1::2, 1::2]], axis=1),
        ],
        axis=1,
    )  # [B, a, b, h2+2, w2+2]
    return ph


def _bcast_hw(a, h2, w2, c):
    """[h2, w2] -> [h2, w2, c] (explicit broadcast; Mosaic rejects the
    equivalent reshape-to-[h2, w2, 1] in bf16)."""
    return jax.lax.broadcast_in_dim(a, (h2, w2, c), (0, 1))


def _bcast_c(v, h2, w2, c):
    """[c] -> [h2, w2, c]."""
    return jax.lax.broadcast_in_dim(v, (h2, w2, c), (2,))


def _phase_conv(xph, w, bias, a_off, b_off, h2, w2):
    """Conv output at positions (2i+a_off, 2j+b_off): ``[h2, w2, C]`` fp32.

    Compute runs in fp32 regardless of storage dtype: Mosaic only supports
    minor-dim-inserting broadcasts for 32-bit types, and the fp32 VPU math
    also keeps the block numerically identical to the unfused path.
    """
    c = w.shape[-1]
    w32 = w.astype(jnp.float32)
    acc = None
    for dh in range(K):
        for dw in range(K):
            oh, ow = a_off + dh, b_off + dw
            win = xph[oh % 2, ow % 2][
                oh // 2 : oh // 2 + h2, ow // 2 : ow // 2 + w2
            ].astype(jnp.float32)
            term = _bcast_hw(win, h2, w2, c) * _bcast_c(w32[dh * K + dw], h2, w2, c)
            acc = term if acc is None else acc + term
    return acc + _bcast_c(bias.astype(jnp.float32), h2, w2, c)


def _fwd_kernel(xph_ref, w_ref, b_ref, alpha_ref, out_ref):
    h2, w2 = out_ref.shape[1], out_ref.shape[2]
    xph = xph_ref[0]
    w = w_ref[...]
    bias = b_ref[...]
    # alpha arrives fp32: Mosaic only supports 32-bit scalar extracts
    alpha = alpha_ref[0]
    pooled = None
    for a in range(2):
        for b in range(2):
            conv = _phase_conv(xph, w, bias, a, b, h2, w2)
            act = jnp.where(conv >= 0, conv, alpha * conv)
            pooled = act if pooled is None else jnp.maximum(pooled, act)
    out_ref[0] = pooled.astype(out_ref.dtype)


def _bwd_kernel(xph_ref, w_ref, b_ref, alpha_ref, g_ref, dw_ref, db_ref, da_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        da_ref[...] = jnp.zeros_like(da_ref)

    h2, w2 = g_ref.shape[1], g_ref.shape[2]
    xph = xph_ref[0]
    w = w_ref[...]
    bias = b_ref[...]
    alpha = alpha_ref[0]
    g = g_ref[0].astype(jnp.float32)

    # recompute activation phases; the pooled max with the forward's
    # first-match priority (phase order 00, 01, 10, 11)
    acts = []
    convs = []
    for a in range(2):
        for b in range(2):
            conv = _phase_conv(xph, w, bias, a, b, h2, w2)
            convs.append(conv)
            acts.append(jnp.where(conv >= 0, conv, alpha * conv))
    m = jnp.maximum(jnp.maximum(acts[0], acts[1]), jnp.maximum(acts[2], acts[3]))

    taken = None
    dw_acc = jnp.zeros_like(dw_ref)
    db_acc = jnp.zeros_like(db_ref)
    da_acc = jnp.zeros_like(da_ref)
    for idx, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        is_max = acts[idx] == m
        if taken is None:
            sel = is_max
            taken = is_max
        else:
            sel = jnp.logical_and(is_max, jnp.logical_not(taken))
            taken = jnp.logical_or(taken, is_max)
        d_act = jnp.where(sel, g, 0)
        neg = convs[idx] < 0
        d_conv = jnp.where(neg, alpha * d_act, d_act).astype(jnp.float32)
        da_acc = da_acc + jnp.sum(
            jnp.where(neg, convs[idx] * d_act, 0).astype(jnp.float32)
        )
        db_acc = db_acc + jnp.sum(d_conv, axis=(0, 1))
        for dh in range(K):
            for dw_ in range(K):
                oh, ow = a + dh, b + dw_
                win = xph[oh % 2, ow % 2][
                    oh // 2 : oh // 2 + h2, ow // 2 : ow // 2 + w2
                ].astype(jnp.float32)
                cc = d_conv.shape[-1]
                dw_acc = dw_acc.at[dh * K + dw_, :].add(
                    jnp.sum(_bcast_hw(win, h2, w2, cc) * d_conv, axis=(0, 1))
                )
    dw_ref[...] += dw_acc
    db_ref[...] += db_acc
    da_ref[...] += da_acc


@jax.custom_vjp
def fused_conv1_prelu_pool(x, w, b, alpha):
    """``[B, H, W] x [9, C] x [C] x [1] -> [B, H2, W2, C]`` fused block."""
    return _fused_fwd_impl(x, w, b, alpha)


def _fused_fwd_impl(x, w, b, alpha):
    bsz, h, win = x.shape
    h2, w2 = _pad_geometry(h, win)
    c = w.shape[-1]
    alpha = alpha.astype(jnp.float32)
    xph = _phases(x, h2, w2)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _fwd_kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(
                (1,) + xph.shape[1:], lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(alpha.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h2, w2, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h2, w2, c), x.dtype),
        interpret=interpret,
    )(xph, w, b, alpha)


def _fused_fwd(x, w, b, alpha):
    return _fused_fwd_impl(x, w, b, alpha), (x, w, b, alpha)


def _fused_bwd(res, g):
    x, w, b, alpha = res
    bsz, h, win = x.shape
    h2, w2 = _pad_geometry(h, win)
    c = w.shape[-1]
    alpha32 = alpha.astype(jnp.float32)
    xph = _phases(x, h2, w2)
    interpret = jax.default_backend() != "tpu"
    dw, db, da = pl.pallas_call(
        _bwd_kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(
                (1,) + xph.shape[1:], lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(alpha.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h2, w2, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((9, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        interpret=interpret,
    )(xph, w, b, alpha32, g)
    return (
        jnp.zeros_like(x),  # input grad unused (transform is stop-gradient)
        dw.astype(w.dtype),
        db.astype(b.dtype),
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
