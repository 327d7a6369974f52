"""Fused attention kernel (ops/flash_attention.py) parity tests.

The kernel is the bandwidth lever for the AST encoder (the [B, H, N, N]
score tensor never exists in HBM); on CPU it runs in Pallas interpret
mode, so these tests check exact fp32 math against the XLA einsum path in
models/ast.py::_Block (reference attention: models.py:462-707 via timm
0.4.5 Attention).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from audiodeepfake_detection_tpu.models.ast import ASTModel
from audiodeepfake_detection_tpu.ops.flash_attention import flash_mha_packed

HI = jax.lax.Precision.HIGHEST


def _ref_mha_packed(qkv, heads, scale):
    b, n, c = qkv.shape
    d = c // 3 // heads
    qkv = qkv.reshape(b, n, 3, heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, precision=HI) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v, precision=HI)
    return out.reshape(b, n, heads * d)


class TestFlashMHAKernel:
    def test_forward_matches_einsum(self):
        b, n, h, d = 2, 227, 4, 64  # AST base384 token count, head dim
        rs = np.random.RandomState(0)
        qkv = jnp.asarray(rs.randn(b, n, 3 * h * d).astype(np.float32))
        scale = 1.0 / math.sqrt(d)
        want = np.asarray(_ref_mha_packed(qkv, h, scale))
        got = np.asarray(flash_mha_packed(qkv, h, scale, HI))
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_gradients_match_einsum(self):
        b, n, h, d = 1, 99, 3, 64  # odd token count (padding path)
        rs = np.random.RandomState(1)
        qkv = jnp.asarray(rs.randn(b, n, 3 * h * d).astype(np.float32))
        scale = 1.0 / math.sqrt(d)

        def loss_ref(qkv):
            return jnp.sum(jnp.sin(_ref_mha_packed(qkv, h, scale)))

        def loss_fused(qkv):
            return jnp.sum(jnp.sin(flash_mha_packed(qkv, h, scale, HI)))

        want = jax.grad(loss_ref)(qkv)
        got = jax.grad(loss_fused)(qkv)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-6
        )


class TestFusedAttentionAST:
    def test_model_forward_and_grads_match_unfused(self):
        kw = dict(
            model_size="tiny224", input_fdim=64, input_tdim=64,
            fstride=16, tstride=16,
        )
        plain = ASTModel(**kw)
        fused = ASTModel(fused_attention=True, **kw)
        x = np.random.RandomState(2).randn(2, 1, 64, 64).astype(np.float32)
        variables = plain.init(jax.random.key(0), x)

        want = np.asarray(plain.apply(variables, x))
        got = np.asarray(fused.apply(variables, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        def loss(m):
            def fn(params):
                out = m.apply(
                    {"params": params}, x, train=True,
                    rngs={"dropout": jax.random.key(1)},
                )
                return jnp.sum(out ** 2)
            return fn

        gw = jax.grad(loss(plain))(variables["params"])
        gg = jax.grad(loss(fused))(variables["params"])
        flat_w, _ = jax.tree_util.tree_flatten_with_path(gw)
        flat_g, _ = jax.tree_util.tree_flatten_with_path(gg)
        for (pw, aw), (pg, ag) in zip(flat_w, flat_g):
            assert pw == pg
            np.testing.assert_allclose(
                np.asarray(ag), np.asarray(aw), rtol=1e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(pw),
            )
