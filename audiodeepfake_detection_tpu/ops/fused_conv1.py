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
* **Block-diagonal phase-merged MXU dots.**  The 4x9 conv tap planes are
  materialized once per image into VMEM scratch (a direct sublane-concat of
  window rows is rejected: "offset mismatch on non-concat dimension"), laid
  out as 36 planes ``[4*9, h2, w2]``.  A (batch, row-block) GRID — which
  Mosaic pipelines, unlike an in-kernel ``fori_loop`` — then computes ALL
  FOUR phases' conv rows as ONE matmul ``W4 [4C, 36] @ P [36, w2]`` with a
  block-diagonal weight matrix (phase ``ph`` occupies rows ``ph*C..`` and
  taps ``ph*9..``), and pools across the four sublane blocks.  This
  quadruples the MXU contraction depth (K=36 vs 9) and quarters the number
  of dot issues vs the previous per-phase formulation.  The output layout
  is ``[B, h2, C, w2]`` so a row write is a leading-index store; the caller
  transposes to NHWC (cheap in XLA).  Planes stay f32 in VMEM (bf16 scratch
  demands 8-aligned dynamic sublane indices) but the dot OPERANDS are cast
  to bf16 when the layer input is bf16 — matching the XLA speed path's
  Precision.DEFAULT conv semantics and the MXU's native rate; fp32 inputs
  keep fp32 dots, so parity paths stay fp32-exact.
* **Compact custom VJP with forward-saved selection masks.**  The layer
  input comes from the (stop-gradient) transform, so no input gradient is
  needed — only ``dW [9, C]``, ``db [C]`` and ``dalpha [1]``.  When the
  block is differentiated, the forward additionally emits a 3-bit selection
  code per output element (``phase | neg << 2``, int8, first-match pool
  tie-break): the backward then needs NO conv recompute — it rebuilds
  ``d_conv4`` from the mask and runs ONE kernel-gradient dot per row,
  carrying block-merged ``[4C, 36]`` accumulators; the diagonal blocks are
  summed into ``dW`` outside the kernel.  ``dalpha`` is recovered from the
  saved pooled output as ``sum(neg ? out*g : 0) / alpha`` (``out = alpha *
  conv`` on negative-selected elements).  KNOWN LIMIT: at ``alpha ==
  0.0`` exactly, the recovery degenerates (out = 0 carries no conv
  information) and dalpha is returned as 0 instead of the true
  ``sum(conv*g)`` — i.e. an exactly-zero slope cannot receive gradient
  through this kernel.  The DCNN initializes alpha = 0.25 (torch PReLU
  default) and fp32 Adam never lands on exactly 0.0, but do NOT use this
  kernel with a ReLU-style ``alpha=0`` init; the unfused path handles it
  correctly.  Primal-only calls (eval) skip the mask entirely.

Used by ``DCNN(fused_layer1=True)``; numerics match the unfused XLA path to
fp32 roundoff for fp32 inputs (compute is fp32 in-kernel).  Tests run the
kernel in interpreter mode on CPU.

Measured train-step series on v5e (batch 128): round-1 rank-1 VPU MACs
33.9 ms vs 16.6 XLA; round-2 per-phase MXU dots + fori_loop 15.35 ms;
+ grid-pipelined row blocks 14.45 vs 13.8 XLA; round-2 final (bf16 dot
operands + block-diagonal phase merge) — see docs/benchmarks.md.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 2  # torch Conv2d(1, C, k, stride=1, padding=2) — zero padding
K = 3  # DCNN layer-1 kernel size; the LCNN MFM variant uses k=5
_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))
NPH = len(_PHASES)
NTAP = K * K  # 9 taps per phase (DCNN variant)


def _pad_geometry(h: int, w: int, k: int = K) -> Tuple[int, int]:
    h_out, w_out = h + 2 * PAD - k + 1, w + 2 * PAD - k + 1
    return h_out // 2, w_out // 2  # pooled (floor) output


def _phases(x: jnp.ndarray, h2: int, w2: int) -> jnp.ndarray:
    """``[B, H, W] -> [B, 2, 2, h2+2, w2+2]`` zero-padded parity phases.

    The ``+2`` phase extension covers every tap start for both supported
    kernels: the largest plane offset is ``(1 + k - 1) // 2`` = 1 (k=3) or
    2 (k=5).
    """
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


def _build_tap_planes(xph_ref, p_ref, h2, w2, k: int = K):
    """Copy the 4 x k^2 conv tap planes into scratch, layout-normalized.

    ``p_ref``: [4*k*k, h2, w2] VMEM scratch, plane ``ph*k*k + dh*k + dw``.
    A direct sublane-concat of the window rows is rejected by Mosaic
    ("offset mismatch on non-concat dimension": the slices carry different
    lane offsets), and per-cell builds need dynamic sublane starts Mosaic
    cannot prove 8-aligned — so the planes are materialized once per image
    (first row-block cell) through 4*k*k static 2-D copies; row-steps then
    read one clean [4*k*k, 1, w2] block.
    """
    ntap = k * k
    for ph, (a, b) in enumerate(_PHASES):
        for dh in range(k):
            for dw in range(k):
                oh, ow = a + dh, b + dw
                p_ref[ph * ntap + dh * k + dw] = xph_ref[
                    0, oh % 2, ow % 2,
                    (oh // 2) : (oh // 2) + h2,
                    (ow // 2) : (ow // 2) + w2,
                ]


def _conv4_row(p_ref, w4, b4, h, w2, dot_dtype, ntap: int = NTAP):
    """All four phases' conv rows at output row ``h`` as ONE matmul.

    ``w4``: [4C, 4*ntap] block-diagonal taps (already cast to
    ``dot_dtype``); returns ``conv4`` [4C, w2] f32 (+bias) and the
    [4*ntap, w2] patch matrix in ``dot_dtype`` (reused by the backward's
    kernel-gradient dot).
    """
    p36 = p_ref[0:NPH * ntap, pl.ds(h, 1), :].reshape(NPH * ntap, w2)
    p36 = p36.astype(dot_dtype)
    conv4 = jax.lax.dot_general(
        w4,
        p36,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [4C, w2]
    return conv4 + b4, p36


def _rows_per_cell(h2: int) -> int:
    for r in (8, 10, 6, 5, 4, 3, 2):
        if h2 % r == 0:
            return r
    return 1


def _fwd_master(*refs, dot_dtype, emit_sel, emit_stats):
    """Forward kernel, parameterized over emitted outputs.

    Grid = (batch, row-blocks): Mosaic pipelines grid cells (overlapped
    DMA/compute), unlike a serial in-kernel ``fori_loop`` over rows.
    Outputs in order: pooled ``out`` [B, h2, C, w2]; if ``emit_sel`` a 3-bit
    selection code per element (``phase | neg << 2``, int8); if
    ``emit_stats`` per-channel f32 ``sum``/``sumsq`` [C, 1] accumulators of
    the ROUNDED output (so statistics are bitwise-equal to re-reading the
    stored activation, as the unfused BN-stats pass does).
    """
    xph_ref, w4_ref, b4_ref, alpha_ref = refs[:4]
    pos = 4
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

    rows, c, w2 = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    h2 = p_ref.shape[1]
    i, hb = pl.program_id(0), pl.program_id(1)
    alpha = alpha_ref[0, 0]

    @pl.when(hb == 0)
    def _():
        _build_tap_planes(xph_ref, p_ref, h2, w2)

    if emit_stats:

        @pl.when(jnp.logical_and(i == 0, hb == 0))
        def _():
            sums_ref[...] = jnp.zeros_like(sums_ref)
            sumsq_ref[...] = jnp.zeros_like(sumsq_ref)

    w4 = w4_ref[...].astype(dot_dtype)
    b4 = b4_ref[...]
    # NB elementwise stays f32 even for bf16 layers: the v5e VPU has no
    # bf16 compare (Mosaic: "Target does not support this comparison" on
    # arith.cmpf bf16) — bf16 is a storage format, not an ALU width, so
    # casting buys conversions without cutting ALU work.  The lever that
    # does work is op COUNT: the pairwise-max index tracking below.
    s_acc = q_acc = None
    if emit_stats:
        s_acc = jnp.zeros((c, 1), jnp.float32)
        q_acc = jnp.zeros((c, 1), jnp.float32)
    for r in range(rows):
        h = hb * rows + r
        conv4, _ = _conv4_row(p_ref, w4, b4, h, w2, dot_dtype)
        act4 = jnp.where(conv4 >= 0, conv4, alpha * conv4)
        acts = [act4[idx * c : (idx + 1) * c] for idx in range(NPH)]
        # pairwise max with index tracking: strict > keeps the first-match
        # tie-break (ties pick the lower index) in roughly half the
        # compare/select ops of the 4-way equality scan
        m01 = jnp.maximum(acts[0], acts[1])
        m23 = jnp.maximum(acts[2], acts[3])
        m = jnp.maximum(m01, m23)
        out_ref[0, r] = m.astype(out_ref.dtype)
        if emit_sel:
            i01 = acts[1] > acts[0]
            i23 = acts[3] > acts[2]
            hi = m23 > m01
            idx_lo = i01.astype(jnp.int32)
            idx_hi = 2 + i23.astype(jnp.int32)
            code = jnp.where(hi, idx_hi, idx_lo)
            pres = [conv4[idx * c : (idx + 1) * c] for idx in range(NPH)]
            pre_sel = jnp.where(
                hi,
                jnp.where(i23, pres[3], pres[2]),
                jnp.where(i01, pres[1], pres[0]),
            )
            code = code + NPH * (pre_sel < 0).astype(jnp.int32)
            sel_ref[0, r] = code.astype(jnp.int8)
        if emit_stats:
            rounded = m.astype(out_ref.dtype).astype(jnp.float32)
            s_acc = s_acc + jnp.sum(rounded, axis=1, keepdims=True)
            q_acc = q_acc + jnp.sum(
                jax.lax.square(rounded), axis=1, keepdims=True
            )
    if emit_stats:
        sums_ref[...] += s_acc
        sumsq_ref[...] += q_acc


def _bwd_kernel(*refs, dot_dtype, with_stats):
    """Mask-driven backward: no conv recompute, one MXU dot per row.

    ``dan`` accumulates the dalpha NUMERATOR ``sum(neg ? out*g : 0)``
    (= ``alpha * dalpha``); the caller divides by alpha outside.  With
    ``with_stats``, the cotangents of the forward's per-channel
    ``sum``/``sumsq`` outputs fold into the per-element gradient as
    ``g_total = g + gs + 2*out*gq`` before the mask logic.
    """
    xph_ref, alpha_ref, g_ref, sel_ref, out_in_ref = refs[:5]
    pos = 5
    gs_ref = gq_ref = None
    if with_stats:
        gs_ref, gq_ref = refs[pos], refs[pos + 1]
        pos += 2
    dw4_ref, db4_ref, dan_ref, p_ref = refs[pos : pos + 4]
    i, hb = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, hb == 0))
    def _():
        dw4_ref[...] = jnp.zeros_like(dw4_ref)
        db4_ref[...] = jnp.zeros_like(db4_ref)
        dan_ref[0, 0] = 0.0  # SMEM: scalar stores only

    rows, c, w2 = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    h2 = p_ref.shape[1]
    alpha = alpha_ref[0, 0]
    gs = gs_ref[...] if with_stats else None  # [C, 1]
    gq = gq_ref[...] if with_stats else None

    @pl.when(hb == 0)
    def _():
        _build_tap_planes(xph_ref, p_ref, h2, w2)

    # [4C, 36] block-merged kernel-grad accumulator (one MXU dot per row:
    # d_conv4 [4C, w2] contracted with patches [36, w2] over w2)
    dk_acc = jnp.zeros((NPH * c, NPH * NTAP), jnp.float32)
    db_acc = jnp.zeros((NPH * c, 1), jnp.float32)
    dan_acc = jnp.zeros((), jnp.float32)
    for r in range(rows):
        h = hb * rows + r
        g = g_ref[0, r].astype(jnp.float32)  # [C, w2]
        code = sel_ref[0, r].astype(jnp.int32)
        o = out_in_ref[0, r].astype(jnp.float32)
        if with_stats:
            g = g + gs + 2.0 * o * gq
        neg = code >= NPH
        ph = code - NPH * neg.astype(jnp.int32)
        scale = jnp.where(neg, alpha, 1.0)
        d_sel = scale * g  # gradient through PReLU at the selected element
        d_parts = [
            jnp.where(ph == idx, d_sel, 0.0) for idx in range(NPH)
        ]
        d_conv4 = jnp.concatenate(d_parts, axis=0)  # [4C, w2]
        dan_acc = dan_acc + jnp.sum(jnp.where(neg, o * g, 0.0))
        db_acc = db_acc + jnp.sum(d_conv4, axis=1, keepdims=True)
        p36 = p_ref[0:NPH * NTAP, pl.ds(h, 1), :].reshape(NPH * NTAP, w2)
        dk_acc = dk_acc + jax.lax.dot_general(
            d_conv4.astype(dot_dtype),
            p36.astype(dot_dtype),
            (((1,), (1,)), ((), ())),  # contract w2 with w2 -> [4C, 36]
            preferred_element_type=jnp.float32,
        )
    dw4_ref[...] += dk_acc
    db4_ref[...] += db_acc
    dan_ref[0, 0] += dan_acc


@jax.custom_vjp
def fused_conv1_prelu_pool(x, w, b, alpha):
    """``[B, H, W] x [9, C] x [C] x [1] -> [B, H2, W2, C]`` fused block."""
    (out_t,) = _fused_fwd_impl(x, w, b, alpha)
    return jnp.transpose(out_t, (0, 1, 3, 2))  # -> NHWC


def _dot_dtype(x):
    # bf16 inputs take the MXU's native rate (matches the XLA speed path's
    # Precision.DEFAULT convs); fp32 parity paths keep fp32 dots.
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


def _prep_w4_b4(w, b):
    """Block-diagonal phase-merged weights [4C, 4*ntap] and bias [4C, 1].

    ``w``: [ntap, C] taps (ntap = k*k; 9 for the DCNN variant, 25 for the
    LCNN MFM variant)."""
    ntap, c = w.shape
    wt = w.astype(jnp.float32).T  # [C, ntap]
    w4 = jnp.zeros((NPH * c, NPH * ntap), jnp.float32)
    for ph in range(NPH):
        w4 = w4.at[ph * c : (ph + 1) * c, ph * ntap : (ph + 1) * ntap].set(wt)
    b4 = jnp.tile(b.astype(jnp.float32), NPH)[:, None]  # [4C, 1]
    return w4, b4


def _prep_params(w, b, alpha):
    """Block-diagonal phase-merged weights [4C, 36], bias [4C, 1], alpha."""
    w4, b4 = _prep_w4_b4(w, b)
    alpha2 = alpha.astype(jnp.float32).reshape(1, 1)
    return w4, b4, alpha2


def _fused_fwd_impl(
    x, w, b, alpha, want_sel: bool = False, want_stats: bool = False
):
    """Run the forward kernel.

    Returns ``out_t [B, h2, C, w2]`` (pre-NHWC-transpose) plus, in order,
    the int8 selection codes (``want_sel``) and the per-channel f32
    ``sum``/``sumsq`` vectors (``want_stats``).
    """
    bsz, h, win = x.shape
    h2, w2 = _pad_geometry(h, win)
    c = w.shape[-1]
    xph = _phases(x, h2, w2)
    w4, b4, alpha2 = _prep_params(w, b, alpha)
    interpret = jax.default_backend() != "tpu"
    rows = _rows_per_cell(h2)
    row_spec = pl.BlockSpec(
        (1, rows, c, w2), lambda i, hb: (i, hb, 0, 0), memory_space=pltpu.VMEM
    )
    stat_spec = pl.BlockSpec(
        (c, 1), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [row_spec]
    out_shape = [jax.ShapeDtypeStruct((bsz, h2, c, w2), x.dtype)]
    if want_sel:
        out_specs.append(row_spec)
        out_shape.append(jax.ShapeDtypeStruct((bsz, h2, c, w2), jnp.int8))
    if want_stats:
        out_specs += [stat_spec, stat_spec]
        out_shape += [jax.ShapeDtypeStruct((c, 1), jnp.float32)] * 2
    res = pl.pallas_call(
        partial(
            _fwd_master,
            dot_dtype=_dot_dtype(x),
            emit_sel=want_sel,
            emit_stats=want_stats,
        ),
        grid=(bsz, h2 // rows),
        in_specs=[
            pl.BlockSpec(
                (1,) + xph.shape[1:], lambda i, hb: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(w4.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                b4.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                alpha2.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=[pltpu.VMEM((NPH * NTAP, h2, w2), jnp.float32)],
        interpret=interpret,
    )(xph, w4, b4, alpha2)
    return res if isinstance(res, tuple) else (res,)


@jax.custom_vjp
def fused_conv1_prelu_pool_stats(x, w, b, alpha):
    """Like :func:`fused_conv1_prelu_pool` but also returns the per-channel
    f32 ``(sum, sumsq)`` of the output — the moments the NEXT BatchNorm
    needs — accumulated in-kernel so the 100+ MB activation is never
    re-read by a statistics pass.  Gradients flow through the moments
    (``d out += gs + 2*out*gq`` inside the backward kernel), matching
    autodiff of ``sum(out)`` / ``sum(out**2)`` exactly."""
    out_t, s, q = _fused_fwd_impl(x, w, b, alpha, want_stats=True)
    return jnp.transpose(out_t, (0, 1, 3, 2)), s[:, 0], q[:, 0]


def _fused_fwd(x, w, b, alpha):
    out_t, sel = _fused_fwd_impl(x, w, b, alpha, want_sel=True)
    out = jnp.transpose(out_t, (0, 1, 3, 2))  # [B, h2, w2, C] (NHWC)
    return out, (x, w, b, alpha, sel, out_t)


def _fused_stats_fwd(x, w, b, alpha):
    out_t, sel, s, q = _fused_fwd_impl(
        x, w, b, alpha, want_sel=True, want_stats=True
    )
    out = jnp.transpose(out_t, (0, 1, 3, 2))
    return (out, s[:, 0], q[:, 0]), (x, w, b, alpha, sel, out_t)


def _run_bwd(res, g, gs=None, gq=None):
    x, w, b, alpha, sel, out_t = res
    bsz, h, win = x.shape
    h2, w2 = _pad_geometry(h, win)
    c = w.shape[-1]
    with_stats = gs is not None
    xph = _phases(x, h2, w2)
    alpha2 = alpha.astype(jnp.float32).reshape(1, 1)
    g_t = jnp.transpose(g, (0, 1, 3, 2))  # [B, h2, C, w2], native dtype
    interpret = jax.default_backend() != "tpu"
    rows = _rows_per_cell(h2)

    def row_spec():
        return pl.BlockSpec(
            (1, rows, c, w2), lambda i, hb: (i, hb, 0, 0),
            memory_space=pltpu.VMEM,
        )

    stat_spec = pl.BlockSpec(
        (c, 1), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(
            (1,) + xph.shape[1:], lambda i, hb: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            alpha2.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM
        ),
        row_spec(),  # g
        row_spec(),  # sel (int8)
        row_spec(),  # saved pooled output
    ]
    inputs = [xph, alpha2, g_t, sel, out_t]
    if with_stats:
        in_specs += [stat_spec, stat_spec]
        inputs += [
            gs.astype(jnp.float32)[:, None],
            gq.astype(jnp.float32)[:, None],
        ]

    dw4, db4, dan = pl.pallas_call(
        partial(_bwd_kernel, dot_dtype=_dot_dtype(x), with_stats=with_stats),
        grid=(bsz, h2 // rows),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (NPH * c, NPH * NTAP), lambda i, hb: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (NPH * c, 1), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
            # scalar accumulator lives in SMEM (VMEM cannot store scalars)
            pl.BlockSpec((1, 1), lambda i, hb: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NPH * c, NPH * NTAP), jnp.float32),
            jax.ShapeDtypeStruct((NPH * c, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((NPH * NTAP, h2, w2), jnp.float32)],
        interpret=interpret,
    )(*inputs)
    # Sum the diagonal blocks of the phase-merged [4C, 36] accumulator.
    dk = sum(
        dw4[ph * c : (ph + 1) * c, ph * NTAP : (ph + 1) * NTAP]
        for ph in range(NPH)
    )  # [C, 9]
    db = jnp.sum(db4[:, 0].reshape(NPH, c), axis=0)
    a32 = alpha.astype(jnp.float32).reshape(())
    da = jnp.where(a32 != 0.0, dan.reshape(()) / a32, 0.0)
    return (
        jnp.zeros_like(x),  # input grad unused (transform is stop-gradient)
        dk.T.astype(w.dtype),
        db.astype(b.dtype),
        da.reshape(alpha.shape).astype(alpha.dtype),
    )


def _fused_bwd(res, g):
    return _run_bwd(res, g)


def _fused_stats_bwd(res, cts):
    g, gs, gq = cts
    return _run_bwd(res, g, gs, gq)


fused_conv1_prelu_pool.defvjp(_fused_fwd, _fused_bwd)
fused_conv1_prelu_pool_stats.defvjp(_fused_stats_fwd, _fused_stats_bwd)


def fused_geometry_fits(
    h: int, w: int, k: int = K, budget_bytes: int = 10 * 2**20
) -> bool:
    """True when the fused first-layer kernel's VMEM footprint fits.

    The tap-plane scratch is ``[4*k*k, h2, w2]`` f32 plus the per-image
    phase block — both scale with the image area.  For degenerate
    geometries (e.g. ``hop_length=1`` spectrograms with tens of thousands
    of frames) the scratch exceeds VMEM and Mosaic fails at compile with
    an opaque allocation error; callers gate on this and fall back to the
    unfused XLA path instead.
    """
    h2, w2 = _pad_geometry(h, w, k)
    if h2 < 1 or w2 < 1:
        return False
    scratch = NPH * k * k * h2 * w2 * 4
    phases = NPH * (h2 + 2) * (w2 + 2) * 4
    return scratch + phases <= budget_bytes


def can_batch_shard(mesh, batch_size: int, axis: str = "data") -> bool:
    """True when a fused kernel should be shard_map'd over ``mesh``: the
    mesh exists, has the named batch axis with >1 devices, and the batch
    divides evenly across it (the gate used by DCNN/LCNN)."""
    if mesh is None:
        return False
    n = getattr(mesh, "shape", {}).get(axis, 1)
    return n > 1 and batch_size % n == 0


def batch_shard_mapped(fn, mesh, axis: str = "data", stat_outputs: int = 0):
    """SPMD wrapper: run a fused kernel per batch shard via ``shard_map``.

    Under plain ``jit`` + GSPMD, an unpartitioned Pallas custom call is
    replicated by XLA — correct, but it all-gathers the batch for that op
    on a multi-chip mesh.  Wrapping in ``shard_map`` runs the kernel on
    each device's batch shard, which is exact: the grid's leading dim IS
    the batch, and the weights are replicated.  The last ``stat_outputs``
    outputs are global sums and are ``psum``'d over ``axis`` (their
    cotangents broadcast back to every shard in the backward, matching the
    unsharded math).  Callers must ensure the axis size divides the batch
    (``can_batch_shard``; the data loaders guarantee this, and
    ``shard_batch`` pads otherwise).
    """

    def call(*args):
        res = fn(*args)
        if stat_outputs == 0:
            return res
        outs = list(res)
        for i in range(len(outs) - stat_outputs, len(outs)):
            outs[i] = jax.lax.psum(outs[i], axis)
        return tuple(outs)

    def wrapped(*args):
        from jax.sharding import PartitionSpec as P

        in_specs = (P(axis),) + (P(),) * (len(args) - 1)
        out_specs = (
            P(axis) if stat_outputs == 0 else (P(axis),) + (P(),) * stat_outputs
        )
        # check_vma=False: pallas_call's out_shape ShapeDtypeStructs carry
        # no varying-mesh-axes annotation, which the checker requires
        return jax.shard_map(
            call, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(*args)

    return wrapped


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


# ---------------------------------------------------------------------------
# LCNN variant: conv2d(1->C, 5x5, pad 2) + MaxFeatureMap2D + maxpool 2x2.
#
# Same machinery (phase decomposition, block-diagonal [4C, 4*25] dots,
# mask-saved VJP) with a different selection set: 4 pool phases x 2 MFM
# channel halves = 8 candidates per output element, a 3-bit code — and no
# learnable slope, so the backward needs only dW/db.  The LCNN geometry is
# ideal for this kernel: [B, 101, 256] input -> h2=50 rows, w2=128 lanes
# (a full lane tile).  Reference block: models.py:73-77 + 161-209.
# ---------------------------------------------------------------------------

K_MFM = 5
NTAP_MFM = K_MFM * K_MFM  # 25 taps per phase
NSEL_MFM = 2 * NPH  # (phase, half) candidates


def _mfm_cands(conv4, c_half):
    """The 8 (phase, half) candidate slices of ``conv4`` [4C, w2], in the
    first-match tie-break order (phase-major, half within)."""
    c = 2 * c_half
    return [
        conv4[ph * c + half * c_half : ph * c + (half + 1) * c_half]
        for ph in range(NPH)
        for half in range(2)
    ]


def _fwd_mfm_kernel(
    xph_ref, w4_ref, b4_ref, out_ref, sel_ref, p_ref, *, dot_dtype, emit_sel
):
    """Forward: pooled MFM max [B, h2, C/2, w2] (+ 3-bit selection code)."""
    rows, c_half, w2 = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    h2 = p_ref.shape[1]
    hb = pl.program_id(1)

    @pl.when(hb == 0)
    def _():
        _build_tap_planes(xph_ref, p_ref, h2, w2, k=K_MFM)

    w4 = w4_ref[...].astype(dot_dtype)
    b4 = b4_ref[...]
    for r in range(rows):
        h = hb * rows + r
        conv4, _ = _conv4_row(p_ref, w4, b4, h, w2, dot_dtype, ntap=NTAP_MFM)
        cands = _mfm_cands(conv4, c_half)
        # pairwise-tournament max with index tracking (strict > keeps the
        # first-match tie-break: ties pick the lower index) — ~20 VPU ops
        # vs ~30 for the 8-way equality scan; the kernel is
        # VPU-throughput-bound, not MXU-bound
        m1 = [jnp.maximum(cands[2 * j], cands[2 * j + 1]) for j in range(4)]
        m2a = jnp.maximum(m1[0], m1[1])
        m2b = jnp.maximum(m1[2], m1[3])
        m = jnp.maximum(m2a, m2b)
        out_ref[0, r] = m.astype(out_ref.dtype)
        if emit_sel:
            i1 = [
                (cands[2 * j + 1] > cands[2 * j]).astype(jnp.int32)
                for j in range(4)
            ]
            hi_a = m1[1] > m1[0]
            hi_b = m1[3] > m1[2]
            idx_a = jnp.where(hi_a, 2 + i1[1], i1[0])
            idx_b = jnp.where(hi_b, 6 + i1[3], 4 + i1[2])
            code = jnp.where(m2b > m2a, idx_b, idx_a)
            sel_ref[0, r] = code.astype(jnp.int8)


def _bwd_mfm_kernel(
    xph_ref, g_ref, sel_ref, dw4_ref, db4_ref, p_ref, *, dot_dtype
):
    """Mask-driven backward: scatter ``g`` to the selected (phase, half)
    slice and run ONE kernel-gradient dot per row."""
    i, hb = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, hb == 0))
    def _():
        dw4_ref[...] = jnp.zeros_like(dw4_ref)
        db4_ref[...] = jnp.zeros_like(db4_ref)

    rows, c_half, w2 = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    h2 = p_ref.shape[1]

    @pl.when(hb == 0)
    def _():
        _build_tap_planes(xph_ref, p_ref, h2, w2, k=K_MFM)

    c4 = NPH * 2 * c_half
    dk_acc = jnp.zeros((c4, NPH * NTAP_MFM), jnp.float32)
    db_acc = jnp.zeros((c4, 1), jnp.float32)
    for r in range(rows):
        h = hb * rows + r
        g = g_ref[0, r].astype(jnp.float32)  # [C/2, w2]
        code = sel_ref[0, r].astype(jnp.int32)
        d_parts = [
            jnp.where(code == idx, g, 0.0) for idx in range(NSEL_MFM)
        ]
        d_conv4 = jnp.concatenate(d_parts, axis=0)  # [4C, w2]
        db_acc = db_acc + jnp.sum(d_conv4, axis=1, keepdims=True)
        p100 = p_ref[0:NPH * NTAP_MFM, pl.ds(h, 1), :].reshape(
            NPH * NTAP_MFM, w2
        )
        dk_acc = dk_acc + jax.lax.dot_general(
            d_conv4.astype(dot_dtype),
            p100.astype(dot_dtype),
            (((1,), (1,)), ((), ())),  # contract w2 with w2 -> [4C, 4*25]
            preferred_element_type=jnp.float32,
        )
    dw4_ref[...] += dk_acc
    db4_ref[...] += db_acc


def _mfm_fwd_impl(x, w, b, want_sel: bool):
    bsz, h, win = x.shape
    h2, w2 = _pad_geometry(h, win, k=K_MFM)
    c = w.shape[-1]
    c_half = c // 2
    xph = _phases(x, h2, w2)
    w4, b4 = _prep_w4_b4(w, b)
    interpret = jax.default_backend() != "tpu"
    rows = _rows_per_cell(h2)
    row_spec = pl.BlockSpec(
        (1, rows, c_half, w2), lambda i, hb: (i, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [row_spec]
    out_shape = [jax.ShapeDtypeStruct((bsz, h2, c_half, w2), x.dtype)]
    if want_sel:
        out_specs.append(row_spec)
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, h2, c_half, w2), jnp.int8)
        )
    if want_sel:
        kern = partial(
            _fwd_mfm_kernel, dot_dtype=_dot_dtype(x), emit_sel=True
        )
    else:
        # no sel output -> one fewer positional ref; thread None explicitly
        def kern(xph_ref, w4_ref, b4_ref, out_ref, p_ref):
            return _fwd_mfm_kernel(
                xph_ref, w4_ref, b4_ref, out_ref, None, p_ref,
                dot_dtype=_dot_dtype(x), emit_sel=False,
            )
    res = pl.pallas_call(
        kern,
        grid=(bsz, h2 // rows),
        in_specs=[
            pl.BlockSpec(
                (1,) + xph.shape[1:], lambda i, hb: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(w4.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                b4.shape, lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(out_specs) if want_sel else out_specs[0],
        out_shape=tuple(out_shape) if want_sel else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((NPH * NTAP_MFM, h2, w2), jnp.float32)
        ],
        interpret=interpret,
    )(xph, w4, b4)
    return res if isinstance(res, tuple) else (res,)


@jax.custom_vjp
def fused_conv_mfm_pool(x, w, b):
    """``[B, H, W] x [25, C] x [C] -> [B, H2, W2, C/2]`` fused LCNN block:
    conv2d(1->C, 5x5, pad 2) + MaxFeatureMap2D + maxpool 2x2."""
    (out_t,) = _mfm_fwd_impl(x, w, b, want_sel=False)
    return jnp.transpose(out_t, (0, 1, 3, 2))  # -> NHWC


def _mfm_fwd(x, w, b):
    out_t, sel = _mfm_fwd_impl(x, w, b, want_sel=True)
    return jnp.transpose(out_t, (0, 1, 3, 2)), (x, w, b, sel)


def _mfm_bwd(res, g):
    x, w, b, sel = res
    bsz, h, win = x.shape
    h2, w2 = _pad_geometry(h, win, k=K_MFM)
    c = w.shape[-1]
    c_half = c // 2
    xph = _phases(x, h2, w2)
    g_t = jnp.transpose(g, (0, 1, 3, 2))  # [B, h2, C/2, w2]
    interpret = jax.default_backend() != "tpu"
    rows = _rows_per_cell(h2)
    row_spec = pl.BlockSpec(
        (1, rows, c_half, w2), lambda i, hb: (i, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dw4, db4 = pl.pallas_call(
        partial(_bwd_mfm_kernel, dot_dtype=_dot_dtype(x)),
        grid=(bsz, h2 // rows),
        in_specs=[
            pl.BlockSpec(
                (1,) + xph.shape[1:], lambda i, hb: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row_spec,  # g
            row_spec,  # sel (int8)
        ],
        out_specs=(
            pl.BlockSpec(
                (NPH * c, NPH * NTAP_MFM), lambda i, hb: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (NPH * c, 1), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NPH * c, NPH * NTAP_MFM), jnp.float32),
            jax.ShapeDtypeStruct((NPH * c, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((NPH * NTAP_MFM, h2, w2), jnp.float32)
        ],
        interpret=interpret,
    )(xph, g_t, sel)
    dk = sum(
        dw4[ph * c : (ph + 1) * c, ph * NTAP_MFM : (ph + 1) * NTAP_MFM]
        for ph in range(NPH)
    )  # [C, 25]
    db = jnp.sum(db4[:, 0].reshape(NPH, c), axis=0)
    return (
        jnp.zeros_like(x),  # input grad unused (transform is stop-gradient)
        dk.T.astype(w.dtype),
        db.astype(b.dtype),
    )


fused_conv_mfm_pool.defvjp(_mfm_fwd, _mfm_bwd)


def reference_conv_mfm_pool(x, w, b):
    """Unfused XLA reference of the LCNN block (for tests)."""
    bsz, h, win = x.shape
    kern = w.reshape(K_MFM, K_MFM, 1, -1)
    conv = jax.lax.conv_general_dilated(
        x[..., None],
        kern,
        window_strides=(1, 1),
        padding=[(PAD, PAD), (PAD, PAD)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b[None, None, None, :]
    c_half = conv.shape[-1] // 2
    act = jnp.maximum(conv[..., :c_half], conv[..., c_half:])
    h_out, w_out = act.shape[1] // 2 * 2, act.shape[2] // 2 * 2
    act = act[:, :h_out, :w_out]
    act = act.reshape(bsz, h_out // 2, 2, w_out // 2, 2, -1)
    return jnp.max(act, axis=(2, 4))
