"""Custom-VJP first conv: forward and gradient equivalence vs plain XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodeepfake_detection_tpu.ops.first_conv import first_conv


def _plain(x, kernel, bias, padding):
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        (1, 1),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + bias


@pytest.mark.parametrize("cin,k,padding", [(1, 3, 2), (2, 3, 2), (1, 3, 1)])
def test_forward_and_grads_match_autodiff(cin, k, padding):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 13, 17, cin).astype(np.float32))
    kernel = jnp.asarray(rng.randn(k, k, cin, 8).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    cot = jnp.asarray(
        rng.randn(4, 13 + 2 * padding - (k - 1), 17 + 2 * padding - (k - 1), 8)
        .astype(np.float32)
    )

    def loss_custom(x, kernel, bias):
        return jnp.vdot(first_conv(x, kernel, bias, padding,
                                   jax.lax.Precision.HIGHEST), cot)

    def loss_plain(x, kernel, bias):
        return jnp.vdot(_plain(x, kernel, bias, padding), cot)

    y_c = first_conv(x, kernel, bias, padding, jax.lax.Precision.HIGHEST)
    y_p = _plain(x, kernel, bias, padding)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_p), rtol=1e-6)

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2))(x, kernel, bias)
    g_p = jax.grad(loss_plain, argnums=(0, 1, 2))(x, kernel, bias)
    for a, b, name in zip(g_c, g_p, ("dx", "dk", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4, err_msg=name
        )


def test_dcnn_train_step_grads_unchanged():
    """The DCNN with the custom-VJP conv1 produces the same parameter
    gradients as a version using the plain autodiff conv (fp32, HIGHEST) —
    the plain version is obtained by patching first_conv to its forward
    impl so JAX derives the backward itself."""
    from unittest import mock

    import audiodeepfake_detection_tpu.ops.first_conv as fc
    from audiodeepfake_detection_tpu.models import DCNN

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 1, 256, 95).astype(np.float32))
    model = DCNN(time_dim=12)
    variables = model.init(jax.random.key(0), x, train=False)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jax.lax.stop_gradient(x),
            train=True,
            rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    grads_custom = jax.grad(loss)(variables["params"])
    with mock.patch.object(fc, "first_conv", fc._conv_fwd_value):
        grads_plain = jax.grad(loss)(variables["params"])

    import jax as _jax

    _jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4
        ),
        grads_custom,
        grads_plain,
    )
    g = grads_custom["cnn_0"]["Conv_0"]
    assert np.abs(np.asarray(g["kernel"])).max() > 0


class TestMaxPoolVJP:
    def _compare(self, x):
        from flax import linen as nn

        from audiodeepfake_detection_tpu.models.layers import max_pool_2x2

        def loss_custom(x):
            return jnp.sum(max_pool_2x2(x) ** 2)

        def loss_plain(x):
            return jnp.sum(
                nn.max_pool(x, window_shape=(2, 2), strides=(2, 2)) ** 2
            )

        np.testing.assert_allclose(
            np.asarray(jax.jit(max_pool_2x2)(x)),
            np.asarray(
                nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            ),
        )
        g_c = jax.grad(loss_custom)(x)
        g_p = jax.grad(loss_plain)(x)  # select_and_scatter reference
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_p))

    def test_grads_match_select_and_scatter(self):
        rng = np.random.RandomState(0)
        self._compare(jnp.asarray(rng.randn(3, 8, 6, 5).astype(np.float32)))

    def test_odd_height_floor_mode(self):
        rng = np.random.RandomState(1)
        self._compare(jnp.asarray(rng.randn(2, 7, 6, 4).astype(np.float32)))

    def test_tie_break_first_max(self):
        # constant blocks: every window is a 4-way tie; gradient must go to
        # the first (row-major) element only, like select_and_scatter/torch
        x = jnp.ones((1, 4, 4, 1), np.float32)
        self._compare(x)

    def test_bf16(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 6, 6, 3)).astype(jnp.bfloat16)
        self._compare(x)
