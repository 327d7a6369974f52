"""Fused PReLU + maxpool 2x2 with a mask-saved VJP (pure VPU kernel).

The DCNN's second/third pool blocks read a full conv activation, apply
PReLU, pool 2x2 — and in the backward run ``select-and-scatter`` plus a
PReLU compare-select over the SAME full-size tensor (measured 0.82 + 0.66
ms/step for pool2's [128, 48, 129, 96] at batch 128).  This kernel fuses
the pair in one NHWC pass and saves a 3-bit selection code (2-bit pool
window position | PReLU-negative bit), so the backward reconstructs the
full-size input cotangent directly from ``(g, code)`` — one read of the
small pooled gradient, one write of the full-size cotangent, no
select-and-scatter and no saved-activation reads.

Layout notes (probed on hardware): blocks are ``[1, rows, W, C]`` with W
in sublanes and C in lanes; H-pairs are adjacent leading-index rows, and
W-pairs use a sublane reshape-split ``v[0:2*W2].reshape(W2, 2, C)`` +
``max``/interleave, which Mosaic lowers cleanly (unlike strided slices).

PReLU is applied BEFORE the pool (torch order; the slope may go negative
during training, so monotonicity cannot be used to swap them).  ``dalpha``
is recovered from the saved pooled output as ``sum(neg ? out*g : 0) /
alpha`` — the same measure-zero ``alpha == 0.0`` limit as
ops/fused_conv1.py (documented there).

Like the conv kernel, the forward can also emit per-channel f32
``(sum, sumsq)`` of the ROUNDED pooled output for the next BatchNorm
(``want_stats``), with the moment cotangents folded into the per-element
gradient in the backward.

Reference counterparts: torch ``nn.PReLU`` + ``nn.MaxPool2d(2, 2)``
(src/audiofakedetect/models.py:254-298).

STATUS — correct but OFF BY DEFAULT (``DCNN(fused_pool=...)``): measured
19.25 vs 12.64 ms/step at batch 128 with both pool sites fused.  Claiming
the pool in Pallas breaks XLA's conv-epilogue fusions around it and adds
two extra Pallas call-sites' worth of batch-minor layout copies, which
cost more than the select-and-scatter + compare-select backward ops the
mask VJP removes (docs/benchmarks.md, negative results).  The win cases
for this machinery are the FIRST-layer blocks (ops/fused_conv1.py), where
a structural tensor never hits HBM at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NSEL = 4  # pool window positions (dh*2 + dw)

from .fused_conv1 import _rows_per_cell  # noqa: E402  (shared row-block rule)


def _fwd_kernel(x_ref, alpha_ref, *refs, emit_sel, emit_stats):
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

    orows, w2, c = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    i, hb = pl.program_id(0), pl.program_id(1)
    alpha = alpha_ref[0, 0]

    if emit_stats:

        @pl.when(jnp.logical_and(i == 0, hb == 0))
        def _():
            sums_ref[...] = jnp.zeros_like(sums_ref)
            sumsq_ref[...] = jnp.zeros_like(sumsq_ref)

    s_acc = q_acc = None
    if emit_stats:
        s_acc = jnp.zeros((1, c), jnp.float32)
        q_acc = jnp.zeros((1, c), jnp.float32)
    for r in range(orows):
        pre = []
        act = []
        for dh in range(2):
            a = x_ref[0, 2 * r + dh, 0 : 2 * w2, :].astype(jnp.float32)
            a = a.reshape(w2, 2, c)
            p = jnp.where(a >= 0, a, alpha * a)
            for dw in range(2):
                pre.append(a[:, dw, :])
                act.append(p[:, dw, :])
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
            code = code + _NSEL * (pre_sel < 0).astype(jnp.int32)
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


def _bwd_kernel(alpha_ref, g_ref, sel_ref, out_in_ref, *refs, with_stats):
    pos = 0
    gs_ref = gq_ref = None
    if with_stats:
        gs_ref, gq_ref = refs[pos], refs[pos + 1]
        pos += 2
    dx_ref, dan_ref = refs[pos], refs[pos + 1]

    orows, w2, c = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    w_full = dx_ref.shape[2]
    i, hb = pl.program_id(0), pl.program_id(1)
    alpha = alpha_ref[0, 0]
    gs = gs_ref[...] if with_stats else None  # [1, C]
    gq = gq_ref[...] if with_stats else None

    @pl.when(jnp.logical_and(i == 0, hb == 0))
    def _():
        dan_ref[0, 0] = 0.0

    dan_acc = jnp.zeros((), jnp.float32)
    tail = w_full - 2 * w2  # dropped odd column (floor pool)
    for r in range(orows):
        g = g_ref[0, r].astype(jnp.float32)  # [W2, C]
        code = sel_ref[0, r].astype(jnp.int32)
        o = out_in_ref[0, r].astype(jnp.float32)
        if with_stats:
            g = g + gs + 2.0 * o * gq
        neg = code >= _NSEL
        base = code - _NSEL * neg.astype(jnp.int32)
        scale = jnp.where(neg, alpha, 1.0)
        d = scale * g
        dan_acc = dan_acc + jnp.sum(jnp.where(neg, o * g, 0.0))
        for dh in range(2):
            parts = [
                jnp.where(base == dh * 2 + dw, d, 0.0)[:, None, :]
                for dw in range(2)
            ]
            row = jnp.concatenate(parts, axis=1).reshape(2 * w2, c)
            if tail:
                row = jnp.concatenate(
                    [row, jnp.zeros((tail, c), jnp.float32)], axis=0
                )
            dx_ref[0, 2 * r + dh] = row.astype(dx_ref.dtype)
    dan_ref[0, 0] += dan_acc


def _fwd_impl(x, alpha, want_sel: bool, want_stats: bool):
    bsz, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    alpha2 = alpha.astype(jnp.float32).reshape(1, 1)
    interpret = jax.default_backend() != "tpu"
    orows = _rows_per_cell(h2)
    in_spec = pl.BlockSpec(
        (1, 2 * orows, w, c), lambda i, hb: (i, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, orows, w2, c), lambda i, hb: (i, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    stat_spec = pl.BlockSpec(
        (1, c), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [out_spec]
    out_shape = [jax.ShapeDtypeStruct((bsz, h2, w2, c), x.dtype)]
    if want_sel:
        out_specs.append(out_spec)
        out_shape.append(jax.ShapeDtypeStruct((bsz, h2, w2, c), jnp.int8))
    if want_stats:
        out_specs += [stat_spec, stat_spec]
        out_shape += [jax.ShapeDtypeStruct((1, c), jnp.float32)] * 2
    res = pl.pallas_call(
        partial(_fwd_kernel, emit_sel=want_sel, emit_stats=want_stats),
        grid=(bsz, h2 // orows),
        in_specs=[
            in_spec,
            pl.BlockSpec(
                (1, 1), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        interpret=interpret,
    )(x, alpha2)
    return res if isinstance(res, tuple) else (res,)


def _run_bwd(res, g, gs=None, gq=None):
    x, alpha, sel, out = res
    bsz, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    with_stats = gs is not None
    alpha2 = alpha.astype(jnp.float32).reshape(1, 1)
    interpret = jax.default_backend() != "tpu"
    orows = _rows_per_cell(h2)
    small_spec = pl.BlockSpec(
        (1, orows, w2, c), lambda i, hb: (i, hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((1, 1), lambda i, hb: (0, 0), memory_space=pltpu.VMEM),
        small_spec,  # g
        small_spec,  # sel
        small_spec,  # saved pooled output
    ]
    inputs = [alpha2, g, sel, out]
    if with_stats:
        stat_spec = pl.BlockSpec(
            (1, c), lambda i, hb: (0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [stat_spec, stat_spec]
        inputs += [
            gs.astype(jnp.float32)[None, :],
            gq.astype(jnp.float32)[None, :],
        ]
    dx, dan = pl.pallas_call(
        partial(_bwd_kernel, with_stats=with_stats),
        grid=(bsz, h2 // orows),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, 2 * orows, w, c), lambda i, hb: (i, hb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda i, hb: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, 2 * h2, w, c), x.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(*inputs)
    if 2 * h2 != h:  # dropped odd row (floor pool): zero cotangent.
        # NB: this concat re-copies the full-size dx; acceptable because
        # odd-H pool inputs are rare and the op is off by default — an
        # in-kernel tail write would need a non-uniform last block.
        dx = jnp.concatenate(
            [dx, jnp.zeros((bsz, h - 2 * h2, w, c), dx.dtype)], axis=1
        )
    a32 = alpha.astype(jnp.float32).reshape(())
    da = jnp.where(a32 != 0.0, dan.reshape(()) / a32, 0.0)
    return dx, da.reshape(alpha.shape).astype(alpha.dtype)


@jax.custom_vjp
def fused_prelu_pool(x, alpha):
    """``PReLU(x)`` then ``maxpool 2x2`` on NHWC ``x``, fused (one pass,
    mask-saved VJP).  ``alpha``: [1] PReLU slope."""
    (out,) = _fwd_impl(x, alpha, want_sel=False, want_stats=False)
    return out


def _pp_fwd(x, alpha):
    out, sel = _fwd_impl(x, alpha, want_sel=True, want_stats=False)
    return out, (x, alpha, sel, out)


def _pp_bwd(res, g):
    return _run_bwd(res, g)


fused_prelu_pool.defvjp(_pp_fwd, _pp_bwd)


@jax.custom_vjp
def fused_prelu_pool_stats(x, alpha):
    """Like :func:`fused_prelu_pool` but also returns per-channel f32
    ``(sum, sumsq)`` of the pooled output for the next BatchNorm."""
    out, s, q = _fwd_impl(x, alpha, want_sel=False, want_stats=True)
    return out, s[0], q[0]


def _pps_fwd(x, alpha):
    out, sel, s, q = _fwd_impl(x, alpha, want_sel=True, want_stats=True)
    return (out, s[0], q[0]), (x, alpha, sel, out)


def _pps_bwd(res, cts):
    g, gs, gq = cts
    return _run_bwd(res, g, gs, gq)


fused_prelu_pool_stats.defvjp(_pps_fwd, _pps_bwd)


def fused_pool_geometry_fits(
    h: int, w: int, c: int, budget_bytes: int = 10 * 2**20
) -> bool:
    """True when the fused PReLU+pool kernel's per-cell VMEM blocks fit.

    Same fallback contract as ``ops.fused_conv1.fused_geometry_fits``: for
    degenerate activation geometries the ``[1, 2*orows, W, C]`` input/dx
    blocks exceed VMEM and Mosaic fails at compile with an opaque
    allocation error, so callers gate on this and use the unfused XLA path
    instead.  Counted at f32 width with a 2x factor for Mosaic's
    double-buffered grid pipelining.
    """
    h2, w2 = h // 2, w // 2
    if h2 < 1 or w2 < 1:
        return False
    orows = _rows_per_cell(h2)
    full_block = 2 * orows * w * c * 4  # fwd input / bwd dx
    small_blocks = orows * w2 * c * (4 + 1 + 4)  # out + int8 sel + g
    return 2 * (full_block + small_blocks) <= budget_bytes


def reference_prelu_pool(x, alpha):
    """Unfused XLA reference (for tests)."""
    act = jnp.where(x >= 0, x, alpha[0] * x)
    b, h, w, c = act.shape
    act = act[:, : h // 2 * 2, : w // 2 * 2]
    act = act.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(act, axis=(2, 4))
