"""Fused multi-head attention as a Pallas TPU kernel (AST encoder).

Not the long-sequence "flash attention" trick — at AST geometry (227
tokens, reference models.py:462-707) one head's whole score matrix is a
206 KB f32 VMEM tile.  The win is pure HBM bandwidth: XLA's attention
(einsum -> softmax -> einsum, models/ast.py) materialises the
``[B, H, N, N]`` score tensor in HBM at least twice per direction
(~40 MB per instance at batch 32, ~6-7 GB/step across 12 blocks forward +
backward) while the per-op profile shows the AST train step is
bandwidth-bound, not MXU-bound.  This kernel computes
``softmax(q @ k^T * scale) @ v`` for every head of one batch element per
grid step, entirely in VMEM.

Layout design (second iteration): the kernel consumes the qkv projection's
output DIRECTLY in its natural ``[B, N, 3*H*D]`` layout and emits
``[B, N, H*D]`` — the exact layouts the surrounding Dense layers produce
and consume — so XLA inserts NO transposes around the call.  Heads are
64-aligned lane slices inside the kernel (cheap in-VMEM relayouts on
~58 KB tiles).  The first iteration used a (batch*head) grid over
pre-transposed ``[BH, N, D]`` operands: the 384 tiny grid steps plus the
XLA transposes producing them measured a net LOSS (fwd 16.6 vs 14.4 ms
per AST step at batch 32) — the wrapper traffic exceeded the score
traffic saved.

The backward recomputes the probabilities in VMEM from the saved qkv
(standard flash-attention backward; scores never exist in HBM in either
direction).

Numerics: accumulation in f32 via ``preferred_element_type``; the
``precision`` argument follows the house contract (parity paths pass
HIGHEST = multi-pass fp32-exact MXU; the bf16 speed mode passes DEFAULT =
one bf16 pass, same as XLA's bf16 einsums).  Softmax is f32 in both paths,
like the XLA path (jax.nn.softmax upcasts).

No attention-dropout support: the fused path requires
``attn_drop_rate == 0`` (the reference trains AST with timm's default 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax_f32(s: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _head_slices(blk, heads, h):
    hd = blk.shape[1] // 3
    d = hd // heads
    q = blk[:, h * d : (h + 1) * d]
    k = blk[:, hd + h * d : hd + (h + 1) * d]
    v = blk[:, 2 * hd + h * d : 2 * hd + (h + 1) * d]
    return q, k, v, d


def _fwd_kernel(qkv_ref, o_ref, *, heads, scale, precision):
    blk = qkv_ref[0]  # [N, 3*H*D], head = a 64-aligned lane slice
    for h in range(heads):
        q, k, v, d = _head_slices(blk, heads, h)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        p = _softmax_f32(s)
        o_ref[0, :, h * d : (h + 1) * d] = jax.lax.dot_general(
            p.astype(blk.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, heads, scale, precision):
    blk = qkv_ref[0]
    do = do_ref[0]
    hd = blk.shape[1] // 3
    for h in range(heads):
        q, k, v, d = _head_slices(blk, heads, h)
        do_h = do[:, h * d : (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        p = _softmax_f32(s)  # bitwise the forward's probabilities
        pc = p.astype(blk.dtype)
        # dv = p^T @ do_h                                      [N, D]
        dv = jax.lax.dot_general(
            pc, do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dp = do_h @ v^T                                      [N, N]
        dp = jax.lax.dot_general(
            do_h, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = (
            p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        ).astype(blk.dtype)
        # dq = ds @ k                                          [N, D]
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dk = ds^T @ q                                        [N, D]
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dt = dqkv_ref.dtype
        dqkv_ref[0, :, h * d : (h + 1) * d] = dq.astype(dt)
        dqkv_ref[0, :, hd + h * d : hd + (h + 1) * d] = dk.astype(dt)
        dqkv_ref[0, :, 2 * hd + h * d : 2 * hd + (h + 1) * d] = dv.astype(dt)


def _spec(n, c):
    return pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def flash_mha_packed(qkv, heads, scale, precision):
    """Fused MHA on packed ``[B, N, 3*H*D]`` qkv; returns ``[B, N, H*D]``.

    ``qkv`` is the qkv Dense output reshaped NOWHERE — lane order is
    ``[3][head][dim]`` exactly as ``Dense(3*H*D)`` emits for the
    ``reshape(b, n, 3, h, d)`` convention in models/ast.py::_Block.
    """
    b, n, c = qkv.shape
    kernel = functools.partial(
        _fwd_kernel, heads=heads, scale=scale, precision=precision
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[_spec(n, c)],
        out_specs=_spec(n, c // 3),
        out_shape=jax.ShapeDtypeStruct((b, n, c // 3), qkv.dtype),
    )(qkv)


def _flash_fwd(qkv, heads, scale, precision):
    return flash_mha_packed(qkv, heads, scale, precision), qkv


def _flash_bwd(heads, scale, precision, qkv, do):
    b, n, c = qkv.shape
    kernel = functools.partial(
        _bwd_kernel, heads=heads, scale=scale, precision=precision
    )
    dqkv = pl.pallas_call(
        kernel,
        grid=(b,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[_spec(n, c), _spec(n, c // 3)],
        out_specs=_spec(n, c),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
    )(qkv, do)
    return (dqkv,)


flash_mha_packed.defvjp(_flash_fwd, _flash_bwd)
