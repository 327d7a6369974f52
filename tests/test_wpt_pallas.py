"""Pallas fused-WPT kernel vs the XLA cascade (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from audiodeepfake_detection_tpu.ops.wpt import wpt_analysis
from audiodeepfake_detection_tpu.ops.wpt_pallas import (
    pallas_node_permutation,
    wpt_packets_pallas,
)


class TestPallasWPT:
    @pytest.mark.parametrize(
        "wavelet,level,t",
        [
            ("haar", 3, 1024),
            ("sym5", 4, 1024),
            ("db4", 5, 2048),
            ("haar", 8, 4096),
            ("coif4", 4, 2048),  # the third bundled-checkpoint wavelet (L=24)
        ],
    )
    def test_matches_xla_cascade(self, wavelet, level, t):
        x = np.random.RandomState(0).randn(4, t).astype(np.float32)
        full = np.asarray(wpt_analysis(jnp.asarray(x), wavelet, level))
        pk = np.asarray(
            wpt_packets_pallas(jnp.asarray(x), wavelet, level, b_tile=4)
        )
        assert pk.shape == full.shape
        np.testing.assert_allclose(pk, full, atol=5e-6)

    def test_fused_log(self):
        x = np.random.RandomState(1).randn(4, 1024).astype(np.float32)
        full = np.asarray(wpt_analysis(jnp.asarray(x), "sym5", 3))
        want = np.log(np.abs(full) ** 2.0 + 1e-12)
        got = np.asarray(
            wpt_packets_pallas(
                jnp.asarray(x), "sym5", 3, log_scale=True, power=2.0, b_tile=4
            )
        )
        # log of |x|**2 + 1e-12 amplifies fp32 roundoff near zero
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)

    def test_batch_padding(self):
        # B not divisible by b_tile: padded internally, cropped on return
        x = np.random.RandomState(2).randn(3, 512).astype(np.float32)
        full = np.asarray(wpt_analysis(jnp.asarray(x), "haar", 2))
        got = np.asarray(wpt_packets_pallas(jnp.asarray(x), "haar", 2, b_tile=4))
        np.testing.assert_allclose(got, full, atol=5e-6)

    def test_node_permutation_is_bijection(self):
        for level in (1, 4, 8):
            perm = pallas_node_permutation(level)
            assert sorted(perm.tolist()) == list(range(2**level))
