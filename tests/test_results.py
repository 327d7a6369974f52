"""Golden-output tests for result aggregation / LaTeX emission.

The emitted strings are a parity surface (reference
train_classifier.py:1371-1446 and utils.py:412-479 produce the paper's
tables), so the exact bytes are locked here; the implementation in
``train/results.py`` is free to change structurally as long as these hold.
"""

import contextlib
import io
import json
import os

import numpy as np

from audiodeepfake_detection_tpu.train.results import (
    print_paper_tables,
    print_results,
)
from audiodeepfake_detection_tpu.utils.config import DotDict, Griderator

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name: str) -> str:
    with open(os.path.join(GOLDEN_DIR, name)) as fh:
        return fh.read()


class TestPrintResults:
    def _run(self, tmp_path):
        grid = Griderator(
            {"wavelet": ["sym5", "coif4"], "cross_sources": [["melgan"], ["pwg"]]},
            init_seeds=[0, 1],
        )
        rng = np.random.RandomState(0)
        exp = {
            0: [tuple(rng.rand(4)) for _ in range(4)],
            1: [tuple(rng.rand(4)) for _ in range(4)],
        }
        args = DotDict(
            transform="packets", wavelet="sym5", log_dir=str(tmp_path),
            enable_gs=True,
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            best = print_results(args, exp, grid, model_file="m")
        return buf.getvalue(), best, tmp_path

    def test_stdout_is_byte_identical(self, tmp_path):
        out, _, _ = self._run(tmp_path)
        assert out == _golden("print_results.txt")

    def test_best_config_and_saved_npy(self, tmp_path):
        _, best, d = self._run(tmp_path)
        assert best == {"seed": 0, "wavelet": "coif4", "cross_sources": ["pwg"]}
        saved = np.load(str(d / "m_sym5,coif4_results.npy"))
        assert saved.shape == (2, 4, 4)

    def test_single_config_no_grid(self, tmp_path, capsys):
        args = DotDict(transform="stft", log_dir=str(tmp_path), enable_gs=False)
        exp = {0: [(0.9, 0.1, 0.8, 0.2)], 1: [(0.8, 0.2, 0.7, 0.3)]}
        best = print_results(args, exp, None, model_file="solo")
        out = capsys.readouterr().out
        assert best is None
        # rows are printed as a numpy object array, so backslashes appear
        # repr-escaped
        assert (
            r"& $80.00$ & $75.00 \\pm 5.00$ & $0.200$ & $0.250 \\pm 0.050$ \\\\"
            in out
        )
        assert "Best unknown eer: 0.2500 +- 0.0500" in out

    def test_empty_results(self, tmp_path):
        args = DotDict(transform="stft", log_dir=str(tmp_path))
        assert print_results(args, {}, None) is None


class TestPaperTables:
    def test_byte_identical(self):
        rng = np.random.RandomState(1)
        eer, acc = rng.rand(12, 5), rng.rand(12, 5)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out = print_paper_tables(eer, acc)
        assert buf.getvalue() == _golden("paper_tables.txt")
        golden = json.loads(_golden("paper_tables.json"))
        assert out == golden


class TestOnlyIGMode:
    def test_empty_result_tuples_do_not_crash(self, tmp_path, capsys):
        """only_ig mode accumulates empty test_results tuples; aggregation
        must degrade gracefully instead of indexing a zero-width array."""
        args = DotDict(transform="packets", wavelet="haar", log_dir=str(tmp_path))
        assert print_results(args, {0: [()]}, None) is None
        assert "no test results" in capsys.readouterr().out
