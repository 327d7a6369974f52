"""AST, grid-model parser and model-factory tests."""

import jax
import numpy as np
import pytest

from audiodeepfake_detection_tpu.models.ast import ASTModel, ast_patch_grid
from audiodeepfake_detection_tpu.models.factory import get_model
from audiodeepfake_detection_tpu.models.gridmodel import (
    get_gridsearch_model,
    parse_model_str,
)
from audiodeepfake_detection_tpu.utils.config import DotDict


class TestAST:
    def test_patch_grid(self):
        # reference get_shape: (256, 101) with stride 10 -> 25 x 9 patches
        assert ast_patch_grid(10, 10, 256, 101) == (25, 9)

    def test_tiny_forward(self):
        model = ASTModel(model_size="tiny224", input_fdim=64, input_tdim=32)
        x = np.random.RandomState(0).randn(2, 1, 64, 32).astype(np.float32)
        variables = model.init(jax.random.key(0), x)
        out = np.asarray(model.apply(variables, x))
        assert out.shape == (2, 2)
        assert np.isfinite(out).all()


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
