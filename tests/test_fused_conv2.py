"""Fused conv2+PReLU+pool mid-layer Pallas block (interpreter mode on CPU).

Covers the mask-saved VJP against the XLA reference: forward, all four
gradients (dx — the new part vs the first-layer kernel — dw, dcorr,
dalpha), the stats variant's moment cotangent folding, odd geometries
(dropped pool row/column), bf16 operands, and the VMEM geometry gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodeepfake_detection_tpu.ops.fused_conv2 import (
    fused_conv2_geometry_fits,
    fused_conv2_prelu_pool,
    fused_conv2_prelu_pool_stats,
    reference_conv2_prelu_pool,
)


def _inputs(h, w, c_in, c_out, seed=0, alpha=0.25):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, h, w, c_in).astype(np.float32))
    wgt = jnp.asarray(rng.randn(9 * c_in, c_out).astype(np.float32) * 0.1)
    corr = jnp.asarray(rng.randn(h, w, c_out).astype(np.float32) * 0.1)
    a = jnp.asarray([alpha], np.float32)
    return x, wgt, corr, a


class TestFusedConv2:
    @pytest.mark.parametrize(
        "h,w,ci,co", [(8, 10, 4, 6), (7, 9, 3, 5), (10, 5, 2, 4)]
    )
    def test_forward_matches_reference(self, h, w, ci, co):
        args = _inputs(h, w, ci, co)
        ref = reference_conv2_prelu_pool(*args)
        got = fused_conv2_prelu_pool(*args)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("h,w", [(8, 10), (7, 9), (51, 8)])
    def test_gradients_match_reference(self, h, w):
        # odd H drops the last conv row from the pool (stft geometry 51);
        # odd W drops the last conv column — both must zero the right
        # dx/dcorr regions
        args = _inputs(h, w, 3, 5, seed=1, alpha=-0.3)

        def loss_f(*a):
            return jnp.sum(jnp.sin(fused_conv2_prelu_pool(*a)))

        def loss_r(*a):
            return jnp.sum(jnp.sin(reference_conv2_prelu_pool(*a)))

        gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(*args)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(*args)
        for name, a, b in zip(("dx", "dw", "dcorr", "dalpha"), gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name
            )

    def test_stats_variant_moments_and_gradients(self):
        args = _inputs(8, 10, 4, 6, seed=2)

        out, s, q = fused_conv2_prelu_pool_stats(*args)
        ref = reference_conv2_prelu_pool(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(jnp.sum(ref, (0, 1, 2))), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(q), np.asarray(jnp.sum(ref**2, (0, 1, 2))), rtol=1e-5
        )

        # gradients THROUGH the moments (the next BN consumes them)
        def loss_f(*a):
            o, s, q = fused_conv2_prelu_pool_stats(*a)
            return jnp.sum(jnp.sin(o)) + 1.3 * jnp.sum(s) + 0.7 * jnp.sum(q)

        def loss_r(*a):
            o = reference_conv2_prelu_pool(*a)
            return (
                jnp.sum(jnp.sin(o))
                + 1.3 * jnp.sum(jnp.sum(o, (0, 1, 2)))
                + 0.7 * jnp.sum(jnp.sum(o**2, (0, 1, 2)))
            )

        gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(*args)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(*args)
        for name, a, b in zip(("dx", "dw", "dcorr", "dalpha"), gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name
            )

    def test_bf16_matches_fp32_reference_loosely(self):
        x, wgt, corr, a = _inputs(8, 10, 4, 6, seed=3)
        ref = reference_conv2_prelu_pool(x, wgt, corr, a)
        got = fused_conv2_prelu_pool(
            x.astype(jnp.bfloat16), wgt.astype(jnp.bfloat16), corr,
            a.astype(jnp.bfloat16),
        )
        assert got.dtype == jnp.bfloat16
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(got, np.float32) / scale, np.asarray(ref) / scale,
            atol=0.05,
        )

    def test_geometry_gate(self):
        assert fused_conv2_geometry_fits(48, 129, 64, 96)
        assert fused_conv2_geometry_fits(51, 129, 64, 96)
        assert not fused_conv2_geometry_fits(1, 129, 64, 96)
        # hop-1 spectrogram scale images blow the in-VMEM image/dx blocks
        assert not fused_conv2_geometry_fits(11026, 129, 64, 96)


class TestFusedLayer2DCNN:
    """Model-level wiring: param-tree equality and numeric parity of
    DCNN(fused_layer2) against the unfused folded path."""

    def _build(self, fused2):
        from audiodeepfake_detection_tpu.models.dcnn import DCNN

        return DCNN(
            fused_layer2=("always" if fused2 else False),
            with_dilation=False, flattend_size=512,
            ochannels1=8, ochannels2=8, ochannels3=12, ochannels4=16,
            ochannels5=8, nclasses=2,
        )

    def test_parity_and_param_tree(self):
        import jax.tree_util as jtu

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 1, 64, 48), np.float32)
        m0, m1 = self._build(False), self._build(True)
        v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
        v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
        assert jtu.tree_structure(v0) == jtu.tree_structure(v1)

        np.testing.assert_allclose(
            np.asarray(m0.apply(v0, x, train=False)),
            np.asarray(m1.apply(v0, x, train=False)),
            atol=1e-5,
        )
        o0, mut0 = m0.apply(
            v0, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        o1, mut1 = m1.apply(
            v0, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)
        for a, b in zip(jtu.tree_leaves(mut0), jtu.tree_leaves(mut1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

        def grads(m):
            def f(params):
                out, _ = m.apply(
                    {"params": params, "batch_stats": v0["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)},
                )
                return jnp.sum(out**2)

            return jax.grad(f)(v0["params"])

        for a, b in zip(
            jtu.tree_leaves(grads(m0)), jtu.tree_leaves(grads(m1))
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_train_gating_uses_xla_path_in_eval(self):
        # fused_layer2=True (not "always") must not invoke the kernel in
        # eval: check by asserting the eval forward still runs when the
        # kernel would be geometry-gated out is covered above; here just
        # confirm True-mode eval equals unfused eval exactly (same XLA path)
        from audiodeepfake_detection_tpu.models.dcnn import DCNN

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 1, 64, 48), np.float32)
        m0 = self._build(False)
        m1 = DCNN(
            fused_layer2=True, with_dilation=False, flattend_size=512,
            ochannels1=8, ochannels2=8, ochannels3=12, ochannels4=16,
            ochannels5=8, nclasses=2,
        )
        v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
        a = np.asarray(m0.apply(v0, x, train=False))
        b = np.asarray(m1.apply(v0, x, train=False))
        np.testing.assert_array_equal(a, b)
