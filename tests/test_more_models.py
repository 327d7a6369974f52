"""AST, grid-model parser and model-factory tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodeepfake_detection_tpu.models.ast import ASTModel, ast_patch_grid
from audiodeepfake_detection_tpu.models.factory import get_model
from audiodeepfake_detection_tpu.models.gridmodel import (
    get_gridsearch_model,
    parse_model_str,
)
from audiodeepfake_detection_tpu.utils.config import DotDict


def _timm_state(d=192, depth=12, hw=14, rng=None):
    """A random state dict in timm-0.4.5 DeiT-distilled layout."""
    rng = rng or np.random.RandomState(0)
    state = {
        "cls_token": rng.randn(1, 1, d).astype(np.float32),
        "dist_token": rng.randn(1, 1, d).astype(np.float32),
        "pos_embed": rng.randn(1, 2 + hw * hw, d).astype(np.float32),
        "patch_embed.proj.weight": rng.randn(d, 3, 16, 16).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(d).astype(np.float32),
        "norm.weight": rng.randn(d).astype(np.float32),
        "norm.bias": rng.randn(d).astype(np.float32),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        state.update(
            {
                p + "norm1.weight": rng.randn(d).astype(np.float32),
                p + "norm1.bias": rng.randn(d).astype(np.float32),
                p + "attn.qkv.weight": rng.randn(3 * d, d).astype(np.float32),
                p + "attn.qkv.bias": rng.randn(3 * d).astype(np.float32),
                p + "attn.proj.weight": rng.randn(d, d).astype(np.float32),
                p + "attn.proj.bias": rng.randn(d).astype(np.float32),
                p + "norm2.weight": rng.randn(d).astype(np.float32),
                p + "norm2.bias": rng.randn(d).astype(np.float32),
                p + "mlp.fc1.weight": rng.randn(4 * d, d).astype(np.float32),
                p + "mlp.fc1.bias": rng.randn(4 * d).astype(np.float32),
                p + "mlp.fc2.weight": rng.randn(d, 4 * d).astype(np.float32),
                p + "mlp.fc2.bias": rng.randn(d).astype(np.float32),
            }
        )
    return state


def _reference_pos_surgery(pos, d, hw, f_dim, t_dim):
    """torch oracle for the reference's pos-embed surgery
    (models.py:598-651): reshape to [1, d, hw, hw], cut-from-middle or
    bilinearly interpolate time then freq, flatten, re-prepend tokens."""
    import torch
    import torch.nn.functional as F

    pos_t = torch.from_numpy(pos)
    grid = (
        pos_t[:, 2:].reshape(1, hw * hw, d).transpose(1, 2).reshape(1, d, hw, hw)
    )
    if t_dim <= hw:
        s = int(hw / 2) - int(t_dim / 2)
        grid = grid[:, :, :, s : s + t_dim]
    else:
        grid = F.interpolate(grid, size=(hw, t_dim), mode="bilinear")
    if f_dim <= hw:
        s = int(hw / 2) - int(f_dim / 2)
        grid = grid[:, :, s : s + f_dim, :]
    else:
        grid = F.interpolate(grid, size=(f_dim, t_dim), mode="bilinear")
    flat = grid.reshape(1, d, f_dim * t_dim).transpose(1, 2)
    return torch.cat([pos_t[:, :2], flat], dim=1).numpy()


class TestAST:
    def test_patch_grid(self):
        # reference get_shape: (256, 101) with stride 10 -> 25 x 9 patches
        assert ast_patch_grid(10, 10, 256, 101) == (25, 9)

    def test_surgery_cut_path_matches_torch(self):
        from audiodeepfake_detection_tpu.models.ast import import_timm_deit

        state = _timm_state()
        # stride 16 on 64x64 -> 4x4 patches: both axes cut from the middle
        out = import_timm_deit(
            state, fstride=16, tstride=16, input_fdim=64, input_tdim=64,
            model_size="tiny224",
        )["params"]
        oracle = _reference_pos_surgery(state["pos_embed"], 192, 14, 4, 4)
        np.testing.assert_allclose(out["pos_embed"], oracle, rtol=1e-6)

    def test_surgery_interp_path_matches_torch(self):
        from audiodeepfake_detection_tpu.models.ast import import_timm_deit

        state = _timm_state()
        # the reference's headline geometry: (256, 101) stride 10 -> 25x9;
        # freq axis interpolates (25 > 14), time axis cuts (9 <= 14)
        out = import_timm_deit(
            state, fstride=10, tstride=10, input_fdim=256, input_tdim=101,
            model_size="tiny224",
        )["params"]
        oracle = _reference_pos_surgery(state["pos_embed"], 192, 14, 25, 9)
        np.testing.assert_allclose(
            out["pos_embed"], oracle, rtol=2e-5, atol=1e-5
        )

    def test_surgery_channel_sum_and_forward(self):
        from audiodeepfake_detection_tpu.models.ast import import_timm_deit

        state = _timm_state()
        variables = import_timm_deit(
            state, fstride=16, tstride=16, input_fdim=64, input_tdim=64,
            model_size="tiny224",
        )
        np.testing.assert_allclose(
            variables["params"]["patch_proj"]["kernel"][..., 0, :],
            np.transpose(
                np.asarray(state["patch_embed.proj.weight"]).sum(1), (1, 2, 0)
            ),
            rtol=1e-6,
        )
        # imported backbone + freshly initialized head runs
        model = ASTModel(
            model_size="tiny224", input_fdim=64, input_tdim=64,
            fstride=16, tstride=16,
        )
        x = np.random.RandomState(1).randn(2, 1, 64, 64).astype(np.float32)
        init = model.init(jax.random.key(0), x)["params"]
        params = dict(variables["params"])
        params["head_norm"] = init["head_norm"]
        params["head"] = init["head"]
        out = np.asarray(model.apply({"params": params}, x))
        assert out.shape == (2, 2) and np.isfinite(out).all()

    def test_import_reference_snapshot_layout(self):
        """A trained reference AST snapshot: DDP 'module.module.' + 'v.'
        backbone prefixes, already-surgered pos_embed, and the mlp_head."""
        from audiodeepfake_detection_tpu.models.ast import import_timm_deit

        rng = np.random.RandomState(2)
        d, f_dim, t_dim = 192, 4, 4
        base = _timm_state()
        snap = {}
        for k, v in base.items():
            if k == "pos_embed":
                v = rng.randn(1, 2 + f_dim * t_dim, d).astype(np.float32)
            if k == "patch_embed.proj.weight":
                v = rng.randn(d, 1, 16, 16).astype(np.float32)
            snap["module.module.v." + k] = v
        snap["module.module.mlp_head.0.weight"] = rng.randn(d).astype(np.float32)
        snap["module.module.mlp_head.0.bias"] = rng.randn(d).astype(np.float32)
        snap["module.module.mlp_head.1.weight"] = rng.randn(2, d).astype(np.float32)
        snap["module.module.mlp_head.1.bias"] = rng.randn(2).astype(np.float32)

        variables = import_timm_deit(
            snap, fstride=16, tstride=16, input_fdim=64, input_tdim=64,
            model_size="tiny224",
        )
        p = variables["params"]
        # pos embed passes through untouched (already adapted)
        np.testing.assert_array_equal(
            p["pos_embed"], snap["module.module.v.pos_embed"]
        )
        # head imported, Linear weight transposed to flax kernel layout
        np.testing.assert_array_equal(
            p["head"]["kernel"], snap["module.module.mlp_head.1.weight"].T
        )
        model = ASTModel(
            model_size="tiny224", input_fdim=64, input_tdim=64,
            fstride=16, tstride=16,
        )
        x = np.random.RandomState(3).randn(2, 1, 64, 64).astype(np.float32)
        out = np.asarray(model.apply(variables, x))
        assert out.shape == (2, 2) and np.isfinite(out).all()

    def test_dropout_and_droppath_train_mode(self):
        model = ASTModel(
            model_size="tiny224", input_fdim=32, input_tdim=32,
            drop_rate=0.2, drop_path_rate=0.3,
        )
        x = np.random.RandomState(0).randn(4, 1, 32, 32).astype(np.float32)
        variables = model.init(jax.random.key(0), x)
        eval_out = np.asarray(model.apply(variables, x, train=False))
        train_out = np.asarray(
            model.apply(
                variables, x, train=True, rngs={"dropout": jax.random.key(1)}
            )
        )
        assert np.isfinite(train_out).all()
        assert not np.allclose(eval_out, train_out)
        # rates 0 (the timm DeiT default) keep train == eval
        model0 = ASTModel(model_size="tiny224", input_fdim=32, input_tdim=32)
        v0 = model0.init(jax.random.key(0), x)
        np.testing.assert_allclose(
            np.asarray(model0.apply(v0, x, train=False)),
            np.asarray(
                model0.apply(
                    v0, x, train=True, rngs={"dropout": jax.random.key(1)}
                )
            ),
            rtol=1e-6,
        )

    def test_tiny_forward(self):
        model = ASTModel(model_size="tiny224", input_fdim=64, input_tdim=32)
        x = np.random.RandomState(0).randn(2, 1, 64, 32).astype(np.float32)
        variables = model.init(jax.random.key(0), x)
        out = np.asarray(model.apply(variables, x))
        assert out.shape == (2, 2)
        assert np.isfinite(out).all()

    def test_remat_blocks_matches_plain(self):
        """remat_blocks=True recomputes block activations on backward but
        must leave loss and gradients unchanged (up to fp32 recompute
        roundoff) — the parameter tree is identical, so the same params
        apply to both."""
        kw = dict(model_size="tiny224", input_fdim=64, input_tdim=32)
        model0 = ASTModel(**kw)
        model1 = ASTModel(remat_blocks=True, **kw)
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 1, 64, 32).astype(np.float32)
        )
        params = model0.init(jax.random.key(0), x)["params"]

        def loss(model, p):
            out = model.apply(
                {"params": p}, x, train=True,
                rngs={"dropout": jax.random.key(1)},
            )
            return (out ** 2).mean()

        l0, g0 = jax.value_and_grad(lambda p: loss(model0, p))(params)
        l1, g1 = jax.value_and_grad(lambda p: loss(model1, p))(params)
        assert abs(float(l0) - float(l1)) < 1e-6
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), g0, g1
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4

    def test_remat_policy_matches_plain(self):
        """Selective remat (remat_policy="dots_saveable": matmul outputs
        saved, elementwise recomputed) must also leave loss and gradients
        unchanged — same contract as full block remat above."""
        kw = dict(model_size="tiny224", input_fdim=64, input_tdim=32)
        model0 = ASTModel(**kw)
        model1 = ASTModel(remat_policy="dots_saveable", **kw)
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 1, 64, 32).astype(np.float32)
        )
        params = model0.init(jax.random.key(0), x)["params"]

        def loss(model, p):
            out = model.apply(
                {"params": p}, x, train=True,
                rngs={"dropout": jax.random.key(1)},
            )
            return (out ** 2).mean()

        l0, g0 = jax.value_and_grad(lambda p: loss(model0, p))(params)
        l1, g1 = jax.value_and_grad(lambda p: loss(model1, p))(params)
        assert abs(float(l0) - float(l1)) < 1e-6
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), g0, g1
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


class TestGridModelParser:
    def test_bracketed_alternatives_expand(self):
        trials = parse_model_str(
            [
                "Conv2d 1 [64,32,128] 2 1 2",
                "MaxPool2d 2 2",
                "Conv2d [64,32,128] 64 1 1 0",
            ]
        )
        assert len(trials) == 3
        assert trials[0][0] == ["Conv2d", "1", "64", "2", "1", "2"]
        assert trials[1][0] == ["Conv2d", "1", "32", "2", "1", "2"]
        assert trials[2][2] == ["Conv2d", "128", "64", "1", "1", "0"]

    def test_mismatched_lengths_raise(self):
        with pytest.raises(RuntimeError):
            parse_model_str(["Conv2d 1 [64,32] [3,5,7] 1 2"])

    # A battery of specs exercising the expansion semantics: multi-variant
    # first layer, zipped multi-variant layers, growing/shrinking variant
    # counts, and wrapped ([module, "spec"]) entries.
    _STR_CASES = [
        ["Conv2d 1 8 3"],
        ["Conv2d 1 [8,16] 3"],
        ["Conv2d [1,2,3] 8 3", "ReLU", "Linear [10,20,30] 2"],
        ["ReLU", "Conv2d 1 [8,16] 3 [1,2] 0", "MaxPool2d 2 2"],
        ["Conv2d 1 [8,16] 3", "Conv2d [8,16,32] 4 3"],  # grows 2 -> 3
        ["Conv2d 1 [8,16,32] 3", "Linear [1,2] 2"],  # shrinks 3 -> 2
        [["W", "Permute 0,2,1,3"], "Conv2d 1 [8,16] 3"],
    ]

    def test_parse_model_str_matches_reference(self):
        from reference_oracle import load_reference_models

        ref = load_reference_models()
        if ref is None:
            pytest.skip("reference checkout unavailable")
        for case in self._STR_CASES:
            ours = parse_model_str([list(e) if isinstance(e, list) else e for e in case])
            theirs = ref.parse_model_str(
                [list(e) if isinstance(e, list) else e for e in case]
            )
            assert ours == theirs, f"divergence for {case}"

    def test_parse_model_matches_reference(self):
        from audiodeepfake_detection_tpu.models.gridmodel import parse_model

        from reference_oracle import load_reference_models

        ref = load_reference_models()
        if ref is None:
            pytest.skip("reference checkout unavailable")

        def model_data():
            return [
                [
                    {"layers": ["Conv2d 1 [8,16] 3", "ReLU"], "input_shape": (1, 4)},
                    {"layers": ["Linear [4,8] 2"], "transforms": ["t"]},
                ],
                [
                    {"layers": ["Conv2d 1 4 3"]},
                ],
            ]

        ours = parse_model(model_data())
        theirs = ref.parse_model(model_data())
        assert ours == theirs

    def test_gridmodel_forward(self):
        model_data = [
            [
                {
                    "layers": [
                        "Conv2d 1 8 3 2 1",
                        "ReLU",
                        "MaxPool2d 2 2",
                        "Flatten 1",
                        "Linear 2048 2",
                    ],
                }
            ]
        ]
        model = get_gridsearch_model(model_data)
        x = np.random.RandomState(0).randn(2, 1, 32, 64).astype(np.float32)
        variables = model.init(jax.random.key(0), x)
        out = np.asarray(model.apply(variables, x))
        assert out.shape == (2, 2)


class TestFactory:
    def test_lcnn_lstm_channels_rule(self):
        args = DotDict(features="none", num_of_scales=256)
        model = get_model(args, "lcnn")
        assert model.lstm_channels == 256
        args = DotDict(features="lfcc", num_of_scales=256)
        assert get_model(args, "lcnn").lstm_channels == 20
        args = DotDict(features="delta", num_of_scales=256)
        assert get_model(args, "lcnn").lstm_channels == 40
        args = DotDict(features="doubledelta", num_of_scales=256)
        assert get_model(args, "lcnn").lstm_channels == 60

    def test_modules_dcnn(self):
        args = DotDict(
            input_dim=[8, 1, 256, 95],
            time_dim_add=1,
            module="DCNN",
            ochannels1=8,
            ochannels2=8,
            ochannels3=12,
            ochannels4=16,
            ochannels5=4,
            kernel1=3,
            flattend_size=320,
            dropout_cnn=0.6,
            dropout_lstm=0.2,
        )
        model = get_model(args, "modules")
        assert model.time_dim == 12
        assert model.get_name() == "DCNN"

    def test_unknown_model_raises(self):
        with pytest.raises(RuntimeError):
            get_model(DotDict(), "nope")


class TestModulesDimensionCheck:
    def _args(self, **over):
        base = dict(
            input_dim=[8, 1, 256, 95],
            time_dim_add=1,
            module="DCNN",
            ochannels1=8,
            ochannels2=8,
            ochannels3=12,
            ochannels4=16,
            ochannels5=4,
            kernel1=3,
            flattend_size=320,
            dropout_cnn=0.6,
            dropout_lstm=0.2,
        )
        base.update(over)
        return DotDict(base)

    def test_valid_dims_pass(self):
        model = get_model(self._args(), "modules")
        assert model.get_name() == "DCNN"

    def test_invalid_dims_raise_model_not_valid(self):
        """The reference gates modular models on torchsummary succeeding
        (models.py:760-762) and raises "Model not valid." otherwise; the
        eval_shape gate must do the same for a broken geometry."""
        with pytest.raises(RuntimeError, match="Model not valid"):
            get_model(self._args(input_dim=[8, 1, 4, 4]), "modules")

    def test_wrong_flattend_size_raises(self):
        with pytest.raises(RuntimeError, match="Model not valid"):
            get_model(self._args(flattend_size=512), "modules")


class TestASTFactory:
    def _args(self, **over):
        base = dict(
            input_dim=[8, 1, 64, 48],
            module="AST",
            flattend_size=48,  # reference: ASTModel reads tdim from here
            ast_model_size="tiny224",
        )
        base.update(over)
        return DotDict(base)

    def test_modules_ast_registry(self):
        """AST is reachable through the driver's modules path with geometry
        plumbed from the config (reference models.py:497-536, 760-765)."""
        model = get_model(self._args(), "modules")
        assert model.get_name() == "AST"
        assert model.input_fdim == 64
        assert model.input_tdim == 48  # flattend_size wins (reference rule)
        assert model.model_size == "tiny224"
        assert model.label_dim == 2

    def test_tdim_falls_back_to_probed_input_dim(self):
        model = get_model(self._args(flattend_size=None), "modules")
        assert model.input_tdim == 48

    def test_astmodel_name_alias(self):
        model = get_model(self._args(module="ASTModel"), "modules")
        assert model.get_name() == "AST"

    def test_remat_and_fused_attention_knobs(self):
        """``ast_remat`` / ``ast_fused_attention`` config keys reach the
        constructor (off by default)."""
        model = get_model(self._args(), "modules")
        assert model.remat_blocks is False
        assert model.fused_attention is False
        model = get_model(
            self._args(ast_remat=True, ast_fused_attention=True), "modules"
        )
        assert model.remat_blocks is True
        assert model.fused_attention is True
        assert model.remat_policy is None
        model = get_model(
            self._args(ast_remat_policy="dots_saveable"), "modules"
        )
        assert model.remat_policy == "dots_saveable"

    def test_bad_geometry_rejected(self):
        # tdim claimed 101 but probed input is 48 wide -> patch reshape fails
        with pytest.raises(RuntimeError, match="Model not valid"):
            get_model(self._args(flattend_size=101), "modules")


class TestASTExportRoundtrip:
    def test_pt_layout_roundtrip(self):
        """export_state_dict(layout="ast") emits the reference's trained
        snapshot layout (v.-prefixed DeiT + mlp_head) and import_timm_deit
        inverts it exactly."""
        import jax

        from audiodeepfake_detection_tpu.models.ast import (
            ASTModel,
            import_timm_deit,
        )
        from audiodeepfake_detection_tpu.models.torch_import import (
            export_state_dict,
        )

        model = ASTModel(model_size="tiny224", input_fdim=32, input_tdim=32)
        x = np.random.RandomState(0).randn(1, 1, 32, 32).astype(np.float32)
        variables = model.init(jax.random.key(0), x, train=False)
        state = export_state_dict(
            {"params": jax.tree.map(np.asarray, variables["params"])},
            layout="ast",
        )
        assert "v.patch_embed.proj.weight" in state
        assert "mlp_head.1.weight" in state
        back = import_timm_deit(
            state, input_fdim=32, input_tdim=32, model_size="tiny224"
        )
        flat0, _ = jax.tree_util.tree_flatten_with_path(variables["params"])
        flat1 = dict(jax.tree_util.tree_flatten_with_path(back["params"])[0])
        for path, leaf in flat0:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat1[path]), rtol=0, atol=0
            )
        # forward agrees bit-for-bit after the round trip
        a = np.asarray(model.apply(variables, x, train=False))
        b = np.asarray(model.apply(back, x, train=False))
        np.testing.assert_array_equal(a, b)


class TestBLSTMUnroll:
    def test_unroll_matches_default(self):
        """lax.scan unroll is a scheduling knob, not a math change."""
        from audiodeepfake_detection_tpu.models.layers import BLSTMLayer

        x = np.random.RandomState(0).randn(3, 13, 16).astype(np.float32)
        base = BLSTMLayer(16, 16)
        variables = base.init(jax.random.key(0), x)
        want = np.asarray(base.apply(variables, x))
        for unroll in (2, 4, True):
            got = np.asarray(
                BLSTMLayer(16, 16, unroll=unroll).apply(variables, x)
            )
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
