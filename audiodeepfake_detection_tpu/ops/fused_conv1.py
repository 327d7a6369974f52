"""Fused first-layer block: conv2d(1->C, 3x3, pad 2) + PReLU + maxpool 2x2.

The DCNN's first layer dominates HBM traffic: its pre-pool activation is
``[B, H+2, W+2, 64]`` (~410 MB at batch 128 bf16), written by the conv,
re-read by PReLU and the pool, and the whole tensor again in the backward.
This kernel keeps the activation strictly in VMEM: one pass reads the
``[B, H, W, 1]`` image (~12 MB) and writes only the pooled output
(~100 MB).

Two structural facts make a compact custom VJP possible:

* the layer input comes from the (stop-gradient) transform, so **no input
  gradient is needed** — only dW, db and dalpha;
* those are small reductions, so the backward *recomputes* the conv in VMEM
  (cheap FLOPs) instead of saving masks, and accumulates
  ``dW [9, C]`` / ``db [C]`` / ``dalpha [1]`` across the sequential TPU grid
  into revisited output blocks.

The 1-input-channel 3x3 conv is expressed as 9 shifted multiply-adds on the
VPU (an MXU matmul would run at 9/128 contraction density).  Used by
``DCNN(fused_layer1=True)``; numerics match the unfused path to fp32
roundoff (tests run the kernel in interpreter mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 2  # torch Conv2d(1, C, 3, stride=1, padding=2)
K = 3


def _conv_rows(x_pad, w, b, h_out, w_out):
    """Conv output [rows, w_out, C] from padded input [rows+2, w_pad]."""
    acc = None
    for dh in range(K):
        for dw in range(K):
            window = x_pad[dh : dh + h_out, dw : dw + w_out]
            term = window[..., None] * w[dh * K + dw][None, None, :]
            acc = term if acc is None else acc + term
    return acc + b[None, None, :]


def _fwd_kernel(x_ref, w_ref, b_ref, alpha_ref, out_ref):
    # x block: [1, H_pad, W_pad]; out block: [1, H2, W2, C]
    h2, w2, c = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    x = x_ref[0]
    w = w_ref[...]
    b = b_ref[...]
    alpha = alpha_ref[0]
    conv = _conv_rows(x, w, b, 2 * h2, 2 * w2)
    act = jnp.where(conv >= 0, conv, alpha * conv)
    pooled = jnp.maximum(
        jnp.maximum(act[0::2, 0::2], act[0::2, 1::2]),
        jnp.maximum(act[1::2, 0::2], act[1::2, 1::2]),
    )
    out_ref[0] = pooled


def _bwd_kernel(x_ref, w_ref, b_ref, alpha_ref, g_ref, dw_ref, db_ref, da_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        da_ref[...] = jnp.zeros_like(da_ref)

    h2, w2, c = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    h_out, w_out = 2 * h2, 2 * w2
    x = x_ref[0]
    w = w_ref[...]
    b = b_ref[...]
    alpha = alpha_ref[0]
    g = g_ref[0]

    conv = _conv_rows(x, w, b, h_out, w_out)
    act = jnp.where(conv >= 0, conv, alpha * conv)
    # pool argmax mask (ties broken toward the first element, matching the
    # forward's nested maximum order closely enough for gradients)
    p00, p01 = act[0::2, 0::2], act[0::2, 1::2]
    p10, p11 = act[1::2, 0::2], act[1::2, 1::2]
    m = jnp.maximum(jnp.maximum(p00, p01), jnp.maximum(p10, p11))
    # distribute pool grad to the (first) max position
    is00 = p00 == m
    is01 = jnp.logical_and(p01 == m, jnp.logical_not(is00))
    is10 = jnp.logical_and(
        p10 == m, jnp.logical_not(jnp.logical_or(is00, is01))
    )
    is11 = jnp.logical_not(jnp.logical_or(jnp.logical_or(is00, is01), is10))
    d_act = jnp.zeros((h_out, w_out, c), g.dtype)
    d_act = d_act.at[0::2, 0::2].set(jnp.where(is00, g, 0))
    d_act = d_act.at[0::2, 1::2].set(jnp.where(is01, g, 0))
    d_act = d_act.at[1::2, 0::2].set(jnp.where(is10, g, 0))
    d_act = d_act.at[1::2, 1::2].set(jnp.where(is11, g, 0))
    # PReLU backward
    neg = conv < 0
    d_conv = jnp.where(neg, alpha * d_act, d_act).astype(jnp.float32)
    da_ref[0] += jnp.sum(jnp.where(neg, conv * d_act, 0.0).astype(jnp.float32))
    db_ref[...] += jnp.sum(d_conv, axis=(0, 1))
    for dh in range(K):
        for dw in range(K):
            window = x[dh : dh + h_out, dw : dw + w_out].astype(jnp.float32)
            dw_ref[dh * K + dw, :] += jnp.sum(
                window[..., None] * d_conv, axis=(0, 1)
            )


def _pad_geometry(h: int, w: int) -> Tuple[int, int, int, int]:
    h_out, w_out = h + 2 * PAD - K + 1, w + 2 * PAD - K + 1
    h2, w2 = h_out // 2, w_out // 2
    return h_out, w_out, h2, w2


def _prep(x, h2, w2):
    """Zero-pad the image so conv windows cover exactly 2*h2 x 2*w2."""
    b, h, w = x.shape
    return jnp.pad(x, ((0, 0), (PAD, 2 * h2 - h - PAD + K - 1), (PAD, 2 * w2 - w - PAD + K - 1)))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_conv1_prelu_pool(x, w, b, alpha):
    """``[B, H, W] x [9, C] x [C] x [1] -> [B, H2, W2, C]`` fused block."""
    return _fused_fwd_impl(x, w, b, alpha)


def _call(kernel, x, w, b, alpha, out_shapes, extra=()):
    interpret = jax.default_backend() != "tpu"
    bsz = x.shape[0]
    grid = (bsz,)
    in_specs = [
        pl.BlockSpec((1, x.shape[1], x.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(w.shape, lambda i: tuple([0] * w.ndim), memory_space=pltpu.VMEM),
        pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec(alpha.shape, lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    for e in extra:
        in_specs.append(
            pl.BlockSpec((1,) + e.shape[1:], lambda i: (i,) + (0,) * (e.ndim - 1), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_shapes[1],
        out_shape=out_shapes[0],
        interpret=interpret,
    )(x, w, b, alpha, *extra)


def _fused_fwd_impl(x, w, b, alpha):
    bsz, h, win = x.shape
    _, _, h2, w2 = _pad_geometry(h, win)
    c = w.shape[-1]
    x_pad = _prep(x, h2, w2)
    out_shape = jax.ShapeDtypeStruct((bsz, h2, w2, c), x.dtype)
    out_spec = pl.BlockSpec(
        (1, h2, w2, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return _call(_fwd_kernel, x_pad, w, b, alpha, (out_shape, out_spec))


def _fused_fwd(x, w, b, alpha):
    return _fused_fwd_impl(x, w, b, alpha), (x, w, b, alpha)


def _fused_bwd(res, g):
    x, w, b, alpha = res
    bsz, h, win = x.shape
    _, _, h2, w2 = _pad_geometry(h, win)
    c = w.shape[-1]
    x_pad = _prep(x, h2, w2)
    interpret = jax.default_backend() != "tpu"
    out_shapes = (
        jax.ShapeDtypeStruct((9, c), jnp.float32),
        jax.ShapeDtypeStruct((c,), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((9, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.VMEM),
    )
    dw, db, da = pl.pallas_call(
        _bwd_kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, x_pad.shape[1], x_pad.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(alpha.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2, w2, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x_pad, w, b, alpha, g)
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
