"""Model parity tests: flax implementations vs the reference torch oracle.

The reference's pure-torch model classes are imported with stubbed heavy
deps (see ``reference_oracle.py``) and used as golden oracles: random torch
weights are imported into the flax models and forward outputs compared.
The bundled trained checkpoints are additionally round-tripped.
"""

import glob

import jax
import numpy as np
import pytest

from audiodeepfake_detection_tpu.models import (
    DCNN,
    LCNN,
    Regression,
    export_state_dict,
    import_dcnn,
    import_lcnn,
    load_torch_state_dict,
)

torch = pytest.importorskip("torch")

from reference_oracle import load_reference_models, reference_dcnn  # noqa: E402


def _flax_dcnn_forward(variables, x, **model_kw):
    model = DCNN(**model_kw)
    return np.asarray(model.apply(variables, x, train=False))


class TestDCNNParity:
    @pytest.mark.parametrize("t_dim,time_dim", [(101, 12), (95, 12), (109, 13)])
    def test_random_weights_forward_parity(self, t_dim, time_dim):
        ref = reference_dcnn(
            "DCNN", input_dim=[2, 1, 256, t_dim], time_dim_add=time_dim - t_dim // 8
        )
        if ref is None:
            pytest.skip("reference checkout unavailable")
        ref.eval()
        x = np.random.RandomState(0).randn(2, 1, 256, t_dim).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        state = {k: v.numpy() for k, v in ref.state_dict().items()}
        variables = jax.tree.map(np.asarray, import_dcnn(state))
        got = _flax_dcnn_forward(variables, x, time_dim=time_dim)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize(
        "tag,t_dim,time_dim",
        [("stft", 101, 12), ("packetssym5", 95, 12), ("packetscoif4", 109, 13)],
    )
    def test_bundled_checkpoint_parity(self, tag, t_dim, time_dim):
        paths = glob.glob(f"/root/reference/models/model_{tag}_*.pt")
        if not paths:
            pytest.skip("bundled checkpoints unavailable")
        state = load_torch_state_dict(paths[0])
        variables = jax.tree.map(np.asarray, import_dcnn(state))
        x = np.random.RandomState(1).randn(4, 1, 256, t_dim).astype(np.float32)
        got = _flax_dcnn_forward(variables, x, time_dim=time_dim)
        assert got.shape == (4, 2)
        assert np.isfinite(got).all()

        ref = reference_dcnn(
            "DCNN", input_dim=[4, 1, 256, t_dim], time_dim_add=time_dim - t_dim // 8
        )
        if ref is None:
            return
        # The coif4 snapshot predates the reference's current Sequential
        # indices; re-key it through our kind-ordered export so the modern
        # reference class can load it.
        state = export_state_dict(variables, layout="dcnn")
        ref.load_state_dict({k: torch.from_numpy(v) for k, v in state.items()})
        ref.eval()
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("variant", ["DCNNxDropout", "DCNNxDilation"])
    def test_ablation_variants(self, variant):
        flattend = 320 if variant == "DCNNxDropout" else 2048
        ref = reference_dcnn(variant, input_dim=[2, 1, 256, 101], flattend_size=flattend)
        if ref is None:
            pytest.skip("reference checkout unavailable")
        ref.eval()
        x = np.random.RandomState(2).randn(2, 1, 256, 101).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        state = {k: v.numpy() for k, v in ref.state_dict().items()}
        variables = jax.tree.map(np.asarray, import_dcnn(state))
        kw = dict(time_dim=12, flattend_size=flattend)
        if variant == "DCNNxDropout":
            kw["with_dropout"] = False
        else:
            kw["with_dilation"] = False
        got = _flax_dcnn_forward(variables, x, **kw)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_export_roundtrip(self):
        paths = glob.glob("/root/reference/models/model_stft_*.pt")
        if not paths:
            pytest.skip("bundled checkpoints unavailable")
        state = load_torch_state_dict(paths[0])
        variables = import_dcnn(state)
        back = export_state_dict(variables, layout="dcnn")
        assert set(back) == set(state)
        for k in state:
            np.testing.assert_array_equal(back[k], state[k])


class TestLCNNParity:
    def test_random_weights_forward_parity(self):
        models = load_reference_models()
        if models is None:
            pytest.skip("reference checkout unavailable")
        ref = models.LCNN(classes=2, in_channels=1, lstm_channels=256)
        ref.eval()
        x = np.random.RandomState(3).randn(2, 1, 256, 101).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        state = {k: v.numpy() for k, v in ref.state_dict().items()}
        variables = jax.tree.map(np.asarray, import_lcnn(state))
        got = np.asarray(
            LCNN(lstm_channels=256).apply(
                variables, np.asarray(x), train=False
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestRegression:
    def test_forward_shape_and_logsoftmax(self):
        model = Regression()
        x = np.random.RandomState(0).randn(3, 1, 256, 101).astype(np.float32)
        variables = model.init(jax.random.key(0), x)
        out = np.asarray(model.apply(variables, x))
        assert out.shape == (3, 2)
        np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, rtol=1e-5)


class TestBatchNormTrainParity:
    def test_train_step_updates_match_torch(self):
        """Biased/unbiased variance split and momentum match torch BN."""
        from audiodeepfake_detection_tpu.models.layers import BatchNorm

        tb = torch.nn.BatchNorm2d(5, affine=False)
        tb.train()
        x = np.random.RandomState(0).randn(4, 5, 7, 3).astype(np.float32)
        with torch.no_grad():
            want = tb(torch.from_numpy(x)).numpy()

        bn = BatchNorm(affine=False)
        variables = bn.init(jax.random.key(0), np.transpose(x, (0, 2, 3, 1)), True)
        got, updates = bn.apply(
            variables, np.transpose(x, (0, 2, 3, 1)), True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(updates["batch_stats"]["mean"]),
            tb.running_mean.numpy(),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(updates["batch_stats"]["var"]),
            tb.running_var.numpy(),
            rtol=1e-5,
            atol=1e-6,
        )
