"""Fused mid-layer block: conv2d(Cin->Cout, 3x3, pad 1) + PReLU + maxpool 2x2.

The DCNN's second pool block is the largest remaining HBM consumer after the
fused first layer: conv ``cnn_7`` writes a ``[B, H, W, Cout]`` pre-pool
activation (~152 MB at batch 128 bf16 for the sym5 geometry 48x129x96), the
PReLU+pool pair re-reads it, and the backward runs ``select-and-scatter``
(0.82 ms), a PReLU compare-select (0.66 ms) and the conv's dx/dw passes over
the same full-size tensors.  This kernel keeps the pre-pool activation
strictly in VMEM: the forward reads the (padded) input image once and writes
only the pooled output + a 3-bit selection code; the backward reconstructs
the conv-output cotangent from ``(g, code)`` in VMEM and emits ``dx``,
``dw``, ``dcorr`` and ``dalpha`` directly — the ``[B, H, W, Cout]`` tensor
never exists in HBM in either direction.

Differences from the first-layer kernel (ops/fused_conv1.py), driven by the
64-channel input:

* **No phase decomposition.**  With ``Cin`` channels the conv1-style tap
  planes would need ``[4*9, h2, w2, Cin]`` scratch (~57 MB) — far over
  VMEM.  Instead each grid cell holds the whole padded input image
  (~840 KB bf16) and builds an im2col patch matrix ``[W, 9*Cin]`` per conv
  row in scratch: 9 static sublane-offset copies (offsets 0..2 — Mosaic
  accepts unaligned *static* slices as copies), then ONE MXU dot
  ``[W, 9*Cin] @ [9*Cin, Cout]`` per conv row (K = 576 for Cin=64 — a
  deep, well-shaped contraction; the conv1 kernel's block-diagonal trick
  is unnecessary at this depth).
* **BN folding via an additive correction map.**  The preceding
  BatchNorm folds into the conv as ``conv(BN(x)) = conv(x, w*s) +
  conv(t*1map, w)`` (models/layers.py:folded_bn_conv).  The kernel takes
  the *effective* weights and a per-position correction map ``corr [H, W,
  Cout]`` (= the batch-1 constant conv + conv bias, exact at the padded
  borders); its gradient is accumulated in-kernel (``dcorr[h] += d_row``)
  and chains outside to the BN moments / bias by autodiff.
* **dx accumulates in persistent VMEM scratch.**  Input rows at row-block
  boundaries receive conv contributions from two adjacent blocks; rather
  than emitting halo slabs and overlap-adding in XLA, the kernel keeps a
  full-image f32 ``dx`` accumulator in scratch (~3.4 MB) — Mosaic scratch
  persists across grid cells and the (batch, row-block) grid visits each
  image's blocks consecutively — and writes it back once at the last
  row block.  ``dw``/``dcorr``/``dalpha`` use whole-array output blocks
  with constant index maps and accumulate across every cell (the conv1
  pattern).

Same contracts as the first-layer kernel: PReLU before pool (torch order),
first-match pool tie-break, 3-bit selection code (2-bit pool position |
PReLU-negative bit), optional per-channel f32 ``(sum, sumsq)`` of the
ROUNDED pooled output for the next BatchNorm with moment cotangents folded
into the per-element gradient, bf16 dot operands for bf16 inputs (fp32
parity paths keep fp32 dots), and the ``alpha == 0.0`` dalpha limit
(documented in ops/fused_conv1.py; the trainer guards imports).

Reference counterparts: torch ``BatchNorm2d`` + ``Conv2d(…, 3, padding=1)``
+ ``PReLU`` + ``MaxPool2d(2, 2)`` (src/audiofakedetect/models.py:268-279).

Used by ``DCNN(fused_layer2=True)``; tests run the kernel in interpreter
mode on CPU (tests/test_fused_conv2.py).

STATUS — correct but OFF BY DEFAULT: measured 20.3 vs 12.4 ms/step at the
headline geometry (batch 128, 48x129x64->96).  Per-op trace: the kernel
pair costs 8.3 ms (fwd 3.3 / bwd 5.0) against ~4 ms of XLA ops replaced,
plus ~1.5 ms of NEW boundary costs (the x jnp.pad + two more Pallas call
sites' layout copies).  The economics differ structurally from the
first-layer kernel: conv2 is MXU-bound (~0.6 ms/direction minimum, which
XLA already achieves) and the eliminable pre-pool intermediate is only
152 MB (~0.75 ms of HBM traffic) — smaller than the fixed Pallas boundary
overhead.  Known further optimizations (im2col copies grouped per input
row instead of per conv row = 3x less VPU traffic; M=W2*2 dots dropping
the pool-discarded conv column; in-kernel padding; transposed d_row for
the (0,0)-contraction kernel-gradient dots) project to ~5.5 ms — still a
net loss.  The kernel wins only when the intermediate grows faster than
the fixed costs (e.g. num_of_scales >= 512 or multi-second frames, where
the pre-pool tensor is 4-8x larger); it is kept correct, tested and
geometry-gated for those configurations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_conv1 import _rows_per_cell

K = 3  # kernel size; padding = 1 (cnn_7 geometry)
NPOS = 4  # pool window positions (a*2 + b)


def _geometry(h: int, w: int):
    """(pooled rows, pooled cols, conv rows used) for pad-1 3x3 + pool 2x2."""
    return h // 2, w // 2, (h // 2) * 2


def _build_patch(x_ref, p_ref, h: int, w: int, c_in: int):
    """im2col row ``h``: ``p_ref[:, t*Cin:(t+1)*Cin] = x_pad[h+dh, dw:dw+W]``.

    9 static copies; the ``dw`` offsets (0..2) are unaligned sublane slices,
    which Mosaic lowers as plain VPU copies (the same pattern as
    fused_conv1._build_tap_planes).  ``p_ref`` stays f32 — the conv1
    kernel's measured rule: unaligned-offset copies into sub-32-bit
    scratch lower badly; the dot operands are cast to the bf16 rate at
    the dot instead.
    """
    for dh in range(K):
        for dw in range(K):
            t = dh * K + dw
            p_ref[:, t * c_in : (t + 1) * c_in] = x_ref[
                0, h + dh, dw : dw + w, :
            ].astype(p_ref.dtype)


def _conv_row(p_ref, w_ref, corr_ref, row_local: int, dot_dtype):
    """One conv output row ``[W, Cout]`` f32: patch @ weights + correction."""
    conv = jax.lax.dot_general(
        p_ref[...].astype(dot_dtype),
        w_ref[...].astype(dot_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return conv + corr_ref[row_local].astype(jnp.float32)


def _fwd_kernel(
    x_ref, w_ref, corr_ref, alpha_ref, *refs, emit_sel, emit_stats
):
    pos = 0
    out_ref = refs[pos]
    pos += 1
    sel_ref = None
    if emit_sel:
        sel_ref = refs[pos]
        pos += 1
    sums_ref = sumsq_ref = None
    if emit_stats:
        sums_ref, sumsq_ref = refs[pos], refs[pos + 1]
        pos += 2
    p_ref = refs[pos]

    rows, w2, c_out = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    w_full = x_ref.shape[2] - 2
    c_in = x_ref.shape[3]
    i, hb = pl.program_id(0), pl.program_id(1)
    alpha = alpha_ref[0, 0]
    # bf16 inputs take the MXU's native rate; the f32 patch scratch
    # is cast at the dot (fp32 parity paths keep fp32 dots)
    dd = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32

    if emit_stats:

        @pl.when(jnp.logical_and(i == 0, hb == 0))
        def _():
            sums_ref[...] = jnp.zeros_like(sums_ref)
            sumsq_ref[...] = jnp.zeros_like(sumsq_ref)

    s_acc = q_acc = None
    if emit_stats:
        s_acc = jnp.zeros((1, c_out), jnp.float32)
        q_acc = jnp.zeros((1, c_out), jnp.float32)
    for r in range(rows):
        pre = []
        act = []
        for a in range(2):
            h = (hb * rows + r) * 2 + a  # global conv row
            _build_patch(x_ref, p_ref, h, w_full, c_in)
            conv = _conv_row(p_ref, w_ref, corr_ref, 2 * r + a, dd)
            # split the row into the two pool column phases (sublane
            # reshape-split — the clean Mosaic lowering, ops/fused_pool.py)
            c2 = conv[0 : 2 * w2].reshape(w2, 2, c_out)
            p2 = jnp.where(c2 >= 0, c2, alpha * c2)
            for b in range(2):
                pre.append(c2[:, b, :])
                act.append(p2[:, b, :])
        # pairwise max with index tracking (strict > keeps the first-match
        # tie-break); see ops/fused_conv1.py
        m01 = jnp.maximum(act[0], act[1])
        m23 = jnp.maximum(act[2], act[3])
        m = jnp.maximum(m01, m23)
        stored = m.astype(out_ref.dtype)
        out_ref[0, r] = stored
        if emit_sel:
            i01 = act[1] > act[0]
            i23 = act[3] > act[2]
            hi = m23 > m01
            code = jnp.where(
                hi, 2 + i23.astype(jnp.int32), i01.astype(jnp.int32)
            )
            pre_sel = jnp.where(
                hi,
                jnp.where(i23, pre[3], pre[2]),
                jnp.where(i01, pre[1], pre[0]),
            )
            code = code + NPOS * (pre_sel < 0).astype(jnp.int32)
            sel_ref[0, r] = code.astype(jnp.int8)
        if emit_stats:
            rounded = stored.astype(jnp.float32)
            s_acc = s_acc + jnp.sum(rounded, axis=0, keepdims=True)
            q_acc = q_acc + jnp.sum(
                jax.lax.square(rounded), axis=0, keepdims=True
            )
    if emit_stats:
        sums_ref[...] += s_acc
        sumsq_ref[...] += q_acc


def _bwd_kernel(
    x_ref, w_ref, alpha_ref, g_ref, sel_ref, out_in_ref, *refs, with_stats
):
    pos = 0
    gs_ref = gq_ref = None
    if with_stats:
        gs_ref, gq_ref = refs[pos], refs[pos + 1]
        pos += 2
    dw_ref, dcorr_ref, dan_ref, dx_ref = refs[pos : pos + 4]
    p_ref, dxacc_ref = refs[pos + 4 : pos + 6]

    rows, w2, c_out = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    w_full = x_ref.shape[2] - 2
    c_in = x_ref.shape[3]
    i, hb = pl.program_id(0), pl.program_id(1)
    n_hb = pl.num_programs(1)
    alpha = alpha_ref[0, 0]
    # bf16 inputs take the MXU's native rate; the f32 patch scratch
    # is cast at the dot (fp32 parity paths keep fp32 dots)
    dd = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    gs = gs_ref[...] if with_stats else None  # [1, Cout]
    gq = gq_ref[...] if with_stats else None
    tail = w_full - 2 * w2  # dropped odd conv column (floor pool)

    @pl.when(jnp.logical_and(i == 0, hb == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dcorr_ref[...] = jnp.zeros_like(dcorr_ref)
        dan_ref[0, 0] = 0.0

    @pl.when(hb == 0)
    def _():
        dxacc_ref[...] = jnp.zeros_like(dxacc_ref)

    dan_acc = jnp.zeros((), jnp.float32)
    for r in range(rows):
        g = g_ref[0, r].astype(jnp.float32)  # [W2, Cout]
        code = sel_ref[0, r].astype(jnp.int32)
        o = out_in_ref[0, r].astype(jnp.float32)
        if with_stats:
            g = g + gs + 2.0 * o * gq
        neg = code >= NPOS
        base = code - NPOS * neg.astype(jnp.int32)
        scale = jnp.where(neg, alpha, 1.0)
        d = scale * g
        dan_acc = dan_acc + jnp.sum(jnp.where(neg, o * g, 0.0))
        for a in range(2):
            h = (hb * rows + r) * 2 + a  # global conv row
            # conv-row cotangent: un-pool the column phases (interleave),
            # dropped odd column gets zero
            parts = [
                jnp.where(base == a * 2 + b, d, 0.0)[:, None, :]
                for b in range(2)
            ]
            d_row = jnp.concatenate(parts, axis=1).reshape(2 * w2, c_out)
            if tail:
                d_row = jnp.concatenate(
                    [d_row, jnp.zeros((tail, c_out), jnp.float32)], axis=0
                )
            dcorr_ref[h] += d_row
            _build_patch(x_ref, p_ref, h, w_full, c_in)
            # kernel gradient: contract the row dim of patches and d_row
            dw_ref[...] += jax.lax.dot_general(
                p_ref[...].astype(dd),
                d_row.astype(dd),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [9*Cin, Cout]
            # input gradient in patch space (lane x lane contraction), then
            # scatter-add the 9 tap slices into the padded-image accumulator
            dxc = jax.lax.dot_general(
                d_row.astype(dd),
                w_ref[...].astype(dd),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [W, 9*Cin]
            for dh in range(K):
                for dw in range(K):
                    t = dh * K + dw
                    dxacc_ref[h + dh, dw : dw + w_full, :] += dxc[
                        :, t * c_in : (t + 1) * c_in
                    ]
    dan_ref[0, 0] += dan_acc

    @pl.when(hb == n_hb - 1)
    def _():
        dx_ref[0] = dxacc_ref[...].astype(dx_ref.dtype)


def _pad_x(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _fwd_impl(x, w, corr, alpha, want_sel: bool, want_stats: bool):
    bsz, h, win, c_in = x.shape
    c_out = w.shape[-1]
    h2, w2, _ = _geometry(h, win)
    xp = _pad_x(x)
    alpha2 = alpha.astype(jnp.float32).reshape(1, 1)
    interpret = jax.default_backend() != "tpu"
    rows = _rows_per_cell(h2)
    out_spec = pl.BlockSpec(
        (1, rows, w2, c_out), lambda i, hb: (i, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    stat_spec = pl.BlockSpec(
        (1, c_out), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [out_spec]
    out_shape = [jax.ShapeDtypeStruct((bsz, h2, w2, c_out), x.dtype)]
    if want_sel:
        out_specs.append(out_spec)
        out_shape.append(jax.ShapeDtypeStruct((bsz, h2, w2, c_out), jnp.int8))
    if want_stats:
        out_specs += [stat_spec, stat_spec]
        out_shape += [jax.ShapeDtypeStruct((1, c_out), jnp.float32)] * 2
    res = pl.pallas_call(
        partial(_fwd_kernel, emit_sel=want_sel, emit_stats=want_stats),
        grid=(bsz, h2 // rows),
        in_specs=[
            pl.BlockSpec(
                (1,) + xp.shape[1:], lambda i, hb: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(w.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2 * rows, win, c_out), lambda i, hb: (hb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=[pltpu.VMEM((win, K * K * c_in), jnp.float32)],
        interpret=interpret,
    )(xp, w.astype(jnp.float32), corr.astype(jnp.float32), alpha2)
    return res if isinstance(res, tuple) else (res,)


def _run_bwd(res, g, gs=None, gq=None):
    x, w, corr, alpha, sel, out = res
    bsz, h, win, c_in = x.shape
    c_out = w.shape[-1]
    h2, w2, h_used = _geometry(h, win)
    with_stats = gs is not None
    xp = _pad_x(x)
    alpha2 = alpha.astype(jnp.float32).reshape(1, 1)
    interpret = jax.default_backend() != "tpu"
    rows = _rows_per_cell(h2)
    small_spec = pl.BlockSpec(
        (1, rows, w2, c_out), lambda i, hb: (i, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec(
            (1,) + xp.shape[1:], lambda i, hb: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(w.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
        small_spec,  # g
        small_spec,  # sel
        small_spec,  # saved pooled output
    ]
    inputs = [xp, w.astype(jnp.float32), alpha2, g, sel, out]
    if with_stats:
        stat_spec = pl.BlockSpec(
            (1, c_out), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [stat_spec, stat_spec]
        inputs += [
            gs.astype(jnp.float32)[None, :],
            gq.astype(jnp.float32)[None, :],
        ]
    dw, dcorr, dan, dxp = pl.pallas_call(
        partial(_bwd_kernel, with_stats=with_stats),
        grid=(bsz, h2 // rows),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                w.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (h_used, win, c_out), lambda i, hb: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda i, hb: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1,) + xp.shape[1:], lambda i, hb: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct((h_used, win, c_out), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct(xp.shape, x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((win, K * K * c_in), jnp.float32),
            pltpu.VMEM(xp.shape[1:], jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    dx = dxp[:, 1 : 1 + h, 1 : 1 + win, :]  # un-pad
    if h_used != h:  # corr rows past the pooled region get zero gradient
        dcorr = jnp.concatenate(
            [dcorr, jnp.zeros((h - h_used, win, c_out), jnp.float32)], axis=0
        )
    a32 = alpha.astype(jnp.float32).reshape(())
    da = jnp.where(a32 != 0.0, dan.reshape(()) / a32, 0.0)
    return (
        dx,
        dw.astype(w.dtype),
        dcorr.astype(corr.dtype),
        da.reshape(alpha.shape).astype(alpha.dtype),
    )


@jax.custom_vjp
def fused_conv2_prelu_pool(x, w, corr, alpha):
    """``[B,H,W,Cin] x [9*Cin,Cout] x [H,W,Cout] x [1] -> [B,H//2,W//2,Cout]``.

    conv2d(3x3, pad 1, effective weights ``w``, additive map ``corr``) +
    PReLU(``alpha``) + maxpool 2x2, one fused pass (mask-saved VJP).
    """
    (out,) = _fwd_impl(x, w, corr, alpha, want_sel=False, want_stats=False)
    return out


def _f2_fwd(x, w, corr, alpha):
    out, sel = _fwd_impl(x, w, corr, alpha, want_sel=True, want_stats=False)
    return out, (x, w, corr, alpha, sel, out)


def _f2_bwd(res, g):
    return _run_bwd(res, g)


fused_conv2_prelu_pool.defvjp(_f2_fwd, _f2_bwd)


@jax.custom_vjp
def fused_conv2_prelu_pool_stats(x, w, corr, alpha):
    """Like :func:`fused_conv2_prelu_pool` plus per-channel f32
    ``(sum, sumsq)`` of the rounded pooled output for the next BatchNorm."""
    out, s, q = _fwd_impl(x, w, corr, alpha, want_sel=False, want_stats=True)
    return out, s[0], q[0]


def _f2s_fwd(x, w, corr, alpha):
    out, sel, s, q = _fwd_impl(
        x, w, corr, alpha, want_sel=True, want_stats=True
    )
    return (out, s[0], q[0]), (x, w, corr, alpha, sel, out)


def _f2s_bwd(res, cts):
    g, gs, gq = cts
    return _run_bwd(res, g, gs, gq)


fused_conv2_prelu_pool_stats.defvjp(_f2s_fwd, _f2s_bwd)


def fused_conv2_geometry_fits(
    h: int, w: int, c_in: int, c_out: int, budget_bytes: int = 12 * 2**20
) -> bool:
    """True when the fused mid-layer kernel's VMEM footprint fits.

    Resident per cell: the whole padded input image, the f32 dx accumulator
    (backward), the f32 ``dcorr`` whole-array block, the patch scratch and
    the streamed row blocks.  Same fallback contract as the other fused
    kernels: callers gate on this and use the unfused XLA path otherwise.
    """
    h2, w2, h_used = _geometry(h, w)
    if h2 < 1 or w2 < 1:
        return False
    rows = _rows_per_cell(h2)
    image = (h + 2) * (w + 2) * c_in * 4  # padded input (f32 upper bound)
    dxacc = (h + 2) * (w + 2) * c_in * 4  # f32 accumulator + dx out block
    dcorr = h_used * w * c_out * 4
    patch = w * K * K * c_in * 4
    stream = 2 * 3 * rows * w2 * c_out * 4  # g/sel/out double-buffered
    corr_blk = 2 * 2 * rows * w * c_out * 4
    return image + 2 * dxacc + dcorr + patch + stream + corr_blk <= budget_bytes


def reference_conv2_prelu_pool(x, w, corr, alpha):
    """Unfused XLA reference of the same block (for tests)."""
    bsz, h, win, c_in = x.shape
    c_out = w.shape[-1]
    kern = w.reshape(K, K, c_in, c_out)
    conv = jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + corr[None]
    act = jnp.where(conv >= 0, conv, alpha[0] * conv)
    h_out, w_out = h // 2 * 2, win // 2 * 2
    act = act[:, :h_out, :w_out]
    act = act.reshape(bsz, h_out // 2, 2, w_out // 2, 2, c_out)
    return jnp.max(act, axis=(2, 4))
