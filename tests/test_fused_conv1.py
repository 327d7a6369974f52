"""Fused conv1+PReLU+pool Pallas block (interpreter mode on CPU)."""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodeepfake_detection_tpu.ops.fused_conv1 import (
    fused_conv1_prelu_pool,
    fused_conv1_prelu_pool_stats,
    fused_conv_mfm_pool,
    reference_conv1_prelu_pool,
    reference_conv_mfm_pool,
)


class TestFusedConv1:
    @pytest.mark.parametrize("h,w,c", [(95, 256, 16), (101, 256, 8), (87, 256, 4)])
    def test_forward_matches_reference(self, h, w, c):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, h, w).astype(np.float32))
        wgt = jnp.asarray(rng.randn(9, c).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
        alpha = jnp.asarray([0.25], np.float32)
        ref = reference_conv1_prelu_pool(x, wgt, b, alpha)
        got = fused_conv1_prelu_pool(x, wgt, b, alpha)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_bf16_inputs_match_bf16_reference(self):
        # bf16 inputs switch the kernel's MXU dots to bf16 operands (the XLA
        # speed path's Precision.DEFAULT semantics); outputs stay close to
        # the fp32 reference at bf16 tolerance.
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 95, 256).astype(np.float32))
        wgt = jnp.asarray(rng.randn(9, 8).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
        alpha = jnp.asarray([0.25], np.float32)
        ref = reference_conv1_prelu_pool(x, wgt, b, alpha)
        got = fused_conv1_prelu_pool(
            x.astype(jnp.bfloat16),
            wgt.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            alpha.astype(jnp.bfloat16),
        )
        assert got.dtype == jnp.bfloat16
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(got, np.float32) / scale,
            np.asarray(ref) / scale,
            atol=0.05,
        )

    def test_bf16_gradients_match_bf16_reference(self):
        # the production configuration (bench.py: dtype=bfloat16, train)
        # runs the BACKWARD kernel with bf16 dot operands — cover it
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(2, 63, 128).astype(np.float32))
        wgt = jnp.asarray(rng.randn(9, 8).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
        alpha = jnp.asarray([0.25], np.float32)
        to16 = lambda *ts: [t.astype(jnp.bfloat16) for t in ts]  # noqa: E731
        x16, w16, b16, a16 = to16(x, wgt, b, alpha)

        def loss_fused(w_, b_, a_):
            return jnp.sum(
                fused_conv1_prelu_pool(x16, w_, b_, a_).astype(jnp.float32)
                ** 2
            )

        def loss_stats(w_, b_, a_):
            y, s, q = fused_conv1_prelu_pool_stats(x16, w_, b_, a_)
            return (
                jnp.sum(y.astype(jnp.float32) ** 2)
                + jnp.sum(s.astype(jnp.float32))
                + 1e-3 * jnp.sum(q.astype(jnp.float32))
            )

        def loss_ref(stats):
            def f(w_, b_, a_):
                y = reference_conv1_prelu_pool(
                    x, w_.astype(jnp.float32), b_.astype(jnp.float32),
                    a_.astype(jnp.float32),
                )
                val = jnp.sum(y**2)
                if stats:
                    val = val + jnp.sum(y) + 1e-3 * jnp.sum(y**2)
                return val

            return f

        for fused_loss, ref_loss in [
            (loss_fused, loss_ref(False)),
            (loss_stats, loss_ref(True)),
        ]:
            gf = jax.grad(fused_loss, argnums=(0, 1, 2))(w16, b16, a16)
            gr = jax.grad(ref_loss, argnums=(0, 1, 2))(wgt, b, alpha)
            for got, want in zip(gf, gr):
                scale = max(float(jnp.max(jnp.abs(want))), 1.0)
                np.testing.assert_allclose(
                    np.asarray(got, np.float32) / scale,
                    np.asarray(want) / scale,
                    atol=0.08,  # bf16 operands vs fp32 reference
                )

    def test_stats_variant_moments_and_gradients(self):
        # The stats variant returns per-channel (sum, sumsq) of the output
        # and routes their cotangents through the backward kernel — the
        # composition below mimics the folded-BN consumer (mean/var of the
        # activation enter the loss).
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 63, 128).astype(np.float32))
        wgt = jnp.asarray(rng.randn(9, 8).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
        alpha = jnp.asarray([0.25], np.float32)

        out, s, q = fused_conv1_prelu_pool_stats(x, wgt, b, alpha)
        ref = reference_conv1_prelu_pool(x, wgt, b, alpha)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        n = out.shape[0] * out.shape[1] * out.shape[2]
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(jnp.sum(ref, axis=(0, 1, 2))),
            rtol=2e-5, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(q), np.asarray(jnp.sum(ref**2, axis=(0, 1, 2))),
            rtol=2e-5, atol=2e-4,
        )

        def bn_like_loss(fn):
            def loss(w_, b_, a_):
                res = fn(w_, b_, a_)
                if isinstance(res, tuple):
                    y, s_, q_ = res
                    mean = s_ / n
                    var = q_ / n - mean**2
                else:
                    y = res
                    mean = jnp.mean(y, axis=(0, 1, 2))
                    var = jnp.mean(y**2, axis=(0, 1, 2)) - mean**2
                ynorm = (y - mean) * jax.lax.rsqrt(var + 1e-5)
                return jnp.sum(ynorm**2) / y.size + jnp.sum(mean**2)

            return loss

        gf = jax.grad(
            bn_like_loss(lambda w_, b_, a_: fused_conv1_prelu_pool_stats(x, w_, b_, a_)),
            argnums=(0, 1, 2),
        )(wgt, b, alpha)
        gr = jax.grad(
            bn_like_loss(lambda w_, b_, a_: reference_conv1_prelu_pool(x, w_, b_, a_)),
            argnums=(0, 1, 2),
        )(wgt, b, alpha)
        for a_, b_ in zip(gf, gr):
            scale = max(float(jnp.max(jnp.abs(b_))), 1e-3)
            np.testing.assert_allclose(
                np.asarray(a_) / scale, np.asarray(b_) / scale, atol=5e-5
            )

    def test_gradients_match_reference(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 63, 128).astype(np.float32))
        wgt = jnp.asarray(rng.randn(9, 8).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
        alpha = jnp.asarray([0.25], np.float32)

        gf = jax.grad(
            lambda w_, b_, a_: jnp.sum(fused_conv1_prelu_pool(x, w_, b_, a_) ** 2),
            argnums=(0, 1, 2),
        )(wgt, b, alpha)
        gr = jax.grad(
            lambda w_, b_, a_: jnp.sum(reference_conv1_prelu_pool(x, w_, b_, a_) ** 2),
            argnums=(0, 1, 2),
        )(wgt, b, alpha)
        for a_, b_ in zip(gf, gr):
            scale = max(float(jnp.max(jnp.abs(b_))), 1.0)
            np.testing.assert_allclose(
                np.asarray(a_) / scale, np.asarray(b_) / scale, atol=3e-5
            )


class TestFusedMFM:
    """LCNN variant: conv(5x5) + MaxFeatureMap2D + pool 2x2."""

    @pytest.mark.parametrize("h,w,c", [(101, 256, 8), (63, 128, 4)])
    def test_forward_matches_reference(self, h, w, c):
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(2, h, w).astype(np.float32))
        wgt = jnp.asarray(rng.randn(25, c).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
        ref = reference_conv_mfm_pool(x, wgt, b)
        got = fused_conv_mfm_pool(x, wgt, b)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_gradients_match_reference(self):
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(2, 63, 128).astype(np.float32))
        wgt = jnp.asarray(rng.randn(25, 8).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
        gf = jax.grad(
            lambda w_, b_: jnp.sum(fused_conv_mfm_pool(x, w_, b_) ** 2),
            argnums=(0, 1),
        )(wgt, b)
        gr = jax.grad(
            lambda w_, b_: jnp.sum(reference_conv_mfm_pool(x, w_, b_) ** 2),
            argnums=(0, 1),
        )(wgt, b)
        for a_, b_ in zip(gf, gr):
            scale = max(float(jnp.max(jnp.abs(b_))), 1.0)
            np.testing.assert_allclose(
                np.asarray(a_) / scale, np.asarray(b_) / scale, atol=3e-5
            )

    def test_bf16_forward_and_train_step(self):
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, 101, 256).astype(np.float32))
        wgt = jnp.asarray(rng.randn(25, 8).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
        ref = reference_conv_mfm_pool(x, wgt, b)
        got = fused_conv_mfm_pool(
            x.astype(jnp.bfloat16),
            wgt.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
        )
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(got, np.float32) / scale,
            np.asarray(ref) / scale,
            atol=0.05,
        )
        # bf16 gradient smoke: finite and non-zero
        g = jax.grad(
            lambda w_: jnp.sum(
                fused_conv_mfm_pool(
                    x.astype(jnp.bfloat16), w_, b.astype(jnp.bfloat16)
                ).astype(jnp.float32)
                ** 2
            )
        )(wgt.astype(jnp.bfloat16))
        assert np.isfinite(np.asarray(g, np.float32)).all()
        assert float(jnp.max(jnp.abs(g.astype(jnp.float32)))) > 0

    def test_fused_lcnn_forward_parity(self):
        from audiodeepfake_detection_tpu.models import LCNN

        x = np.random.RandomState(8).randn(2, 1, 256, 101).astype(np.float32)
        base_model = LCNN(lstm_channels=256)
        v = base_model.init(jax.random.key(0), x, train=False)
        base = np.asarray(base_model.apply(v, x, train=False))
        fused = np.asarray(
            LCNN(lstm_channels=256, fused_layer1="always").apply(
                v, x, train=False
            )
        )
        np.testing.assert_allclose(fused, base, atol=1e-4)


class TestFusedPool:
    """PReLU + maxpool 2x2 fused block (ops/fused_pool.py)."""

    @pytest.mark.parametrize("h,w,c", [(48, 129, 96), (24, 64, 64), (7, 9, 8)])
    def test_forward_matches_reference(self, h, w, c):
        from audiodeepfake_detection_tpu.ops.fused_pool import (
            fused_prelu_pool,
            reference_prelu_pool,
        )

        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        alpha = jnp.asarray([0.25], np.float32)
        ref = reference_prelu_pool(x, alpha)
        got = fused_prelu_pool(x, alpha)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_gradients_match_reference(self):
        from audiodeepfake_detection_tpu.ops.fused_pool import (
            fused_prelu_pool,
            fused_prelu_pool_stats,
            reference_prelu_pool,
        )

        rng = np.random.RandomState(10)
        x = jnp.asarray(rng.randn(2, 12, 33, 16).astype(np.float32))
        alpha = jnp.asarray([0.25], np.float32)
        n = 2 * 6 * 16

        def bn_like(y, s, q):
            mean = s / n
            var = q / n - mean**2
            return jnp.sum(((y - mean) * jax.lax.rsqrt(var + 1e-5)) ** 2) / (
                y.size
            ) + jnp.sum(mean**2)

        gf = jax.grad(
            lambda x_, a_: jnp.sum(fused_prelu_pool(x_, a_) ** 2),
            argnums=(0, 1),
        )(x, alpha)
        gr = jax.grad(
            lambda x_, a_: jnp.sum(reference_prelu_pool(x_, a_) ** 2),
            argnums=(0, 1),
        )(x, alpha)
        for a_, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=3e-5)

        # stats variant: moment cotangents fold into the element gradient
        gfs = jax.grad(
            lambda x_, a_: bn_like(*fused_prelu_pool_stats(x_, a_)),
            argnums=(0, 1),
        )(x, alpha)
        grs = jax.grad(
            lambda x_, a_: bn_like(
                reference_prelu_pool(x_, a_),
                jnp.sum(reference_prelu_pool(x_, a_), axis=(0, 1, 2)),
                jnp.sum(reference_prelu_pool(x_, a_) ** 2, axis=(0, 1, 2)),
            ),
            argnums=(0, 1),
        )(x, alpha)
        for a_, b_ in zip(gfs, grs):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=3e-5)

    def test_fused_dcnn_pool_forward_parity(self):
        from audiodeepfake_detection_tpu.models import DCNN

        x = np.random.RandomState(11).randn(2, 1, 256, 95).astype(np.float32)
        base_model = DCNN(time_dim=12)
        v = base_model.init(jax.random.key(0), x, train=False)
        base = np.asarray(base_model.apply(v, x, train=False))
        fused = np.asarray(
            DCNN(time_dim=12, fused_pool="always").apply(v, x, train=False)
        )
        np.testing.assert_allclose(fused, base, atol=1e-5)


class TestFusedDCNN:
    def test_bundled_checkpoint_forward_parity(self):
        from audiodeepfake_detection_tpu.models import (
            DCNN,
            import_dcnn,
            load_torch_state_dict,
        )

        paths = glob.glob("/root/reference/models/model_packetssym5_*.pt")
        if not paths:
            pytest.skip("bundled checkpoints unavailable")
        v = jax.tree.map(np.asarray, import_dcnn(load_torch_state_dict(paths[0])))
        x = np.random.RandomState(0).randn(4, 1, 256, 95).astype(np.float32)
        base = np.asarray(DCNN(time_dim=12).apply(v, x, train=False))
        # "always" forces the kernel in eval mode too (True = training only;
        # XLA's plain forward wins for inference)
        fused = np.asarray(
            DCNN(time_dim=12, fused_layer1="always").apply(v, x, train=False)
        )
        np.testing.assert_allclose(fused, base, atol=1e-4)

    def test_eval_gating_uses_xla_path(self):
        # fused_layer1=True engages the kernel for TRAINING only: in eval
        # the model must be BITWISE identical to the unfused one (same XLA
        # program), unlike "always" which runs the kernel.
        from audiodeepfake_detection_tpu.models import DCNN

        x = np.random.RandomState(12).randn(2, 1, 256, 95).astype(np.float32)
        base_model = DCNN(time_dim=12)
        v = base_model.init(jax.random.key(0), x, train=False)
        base = np.asarray(base_model.apply(v, x, train=False))
        gated = np.asarray(
            DCNN(time_dim=12, fused_layer1=True).apply(v, x, train=False)
        )
        np.testing.assert_array_equal(gated, base)

    def test_oversized_geometry_falls_back_to_unfused(self):
        # a hop_length=1-style spectrogram (tens of thousands of frames)
        # exceeds the kernel's VMEM tap-plane scratch: the geometry gate
        # must reject it so the models use the unfused path instead of
        # failing at Mosaic compile with an opaque allocation error
        from audiodeepfake_detection_tpu.ops.fused_conv1 import (
            fused_geometry_fits,
        )

        # the production geometries all fit
        assert fused_geometry_fits(95, 256, 3)  # packets-sym5 DCNN
        assert fused_geometry_fits(109, 256, 3)  # packets-coif4 DCNN
        assert fused_geometry_fits(101, 256, 3)  # stft DCNN
        assert fused_geometry_fits(101, 256, 5)  # stft LCNN
        # hop_length=1 spectrograms do not (the observed v5e failure:
        # f32[100, 11032, 128] scratch vs 128 MB VMEM ceiling)
        assert not fused_geometry_fits(11026, 256, 5)
        assert not fused_geometry_fits(11026, 256, 3)

    def test_two_channel_input_falls_back_to_unfused(self):
        # loss_less sign-channel configs feed 2 input channels; the fused
        # kernel requires 1 and the model must silently use the XLA path
        from audiodeepfake_detection_tpu.models import DCNN

        x = np.random.RandomState(13).randn(2, 2, 256, 95).astype(np.float32)
        base_model = DCNN(time_dim=12, in_channels=2)
        v = base_model.init(jax.random.key(0), x, train=False)
        base = np.asarray(base_model.apply(v, x, train=False))
        fused = np.asarray(
            DCNN(time_dim=12, in_channels=2, fused_layer1="always").apply(
                v, x, train=False
            )
        )
        np.testing.assert_array_equal(fused, base)

    def test_train_step_runs_with_fused_layer(self):
        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.train.steps import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        model = DCNN(
            time_dim=1,
            ochannels1=4,
            ochannels2=4,
            ochannels3=6,
            ochannels4=8,
            ochannels5=4,
            fused_layer1=True,
        )

        def transform(audio):
            return packet_image(audio, "haar", level=8, log_scale=True)

        tx = make_optimizer(4e-4, 1e-3)
        rng = np.random.RandomState(0)
        batch = {
            "audio": rng.randn(8, 1, 2048).astype(np.float32),
            "label": rng.randint(0, 2, 8).astype(np.int32),
        }
        img = transform(jnp.asarray(batch["audio"][:2]))
        state = create_train_state(model, tx, img, seed=0)
        step = make_train_step(model, transform, tx)
        state, stats = step(state, batch)
        l0 = float(stats["loss"])
        for _ in range(3):
            state, stats = step(state, batch)
        assert np.isfinite(float(stats["loss"]))
        assert float(stats["loss"]) < l0  # it learns on the fixed batch
