"""Serving-artifact export (train/export.py).

The reference has no deployment artifact (inference = ``--only-testing``
inside the training driver, reference train_classifier.py:1311-1323);
these tests lock our ``jax.export`` path: the serialized StableHLO scorer
must reproduce the in-process jitted scorer exactly, for concrete and
symbolic batch sizes, through the single-file artifact round-trip.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodeepfake_detection_tpu.models.regression import Regression
from audiodeepfake_detection_tpu.ops.wpt import packet_image
from audiodeepfake_detection_tpu.train.export import (
    export_scorer,
    load_artifact,
    main,
    save_artifact,
)
from audiodeepfake_detection_tpu.train.predict import make_score_fn

WIN = 2048


def _tiny_scorer():
    """Level-4 sym5 packets + Regression: cheap but exercises the real
    transform stack (conv cascade, log scaling) and a flax model."""

    def transform(audio):
        return packet_image(
            audio, "sym5", level=4, log_scale=True, power=2.0,
            use_pallas=False,
        )

    model = Regression()
    img = transform(jnp.zeros((1, 1, WIN)))
    variables = model.init(jax.random.key(0), img)
    return model, transform, variables


class TestExportScorer:
    def test_concrete_batch_roundtrip(self, tmp_path):
        model, transform, variables = _tiny_scorer()
        exported = export_scorer(model, transform, variables, WIN, batch_size=3)
        path = os.path.join(tmp_path, "scorer.adfx")
        save_artifact(exported, path, {"win": WIN})

        reloaded, meta = load_artifact(path)
        assert meta["win"] == WIN
        assert meta["in_shape"] == ["3", "1", str(WIN)]

        rng = np.random.RandomState(0)
        audio = jnp.asarray(rng.randn(3, 1, WIN).astype(np.float32))
        want = np.asarray(make_score_fn(model, transform, variables)(audio))
        got = np.asarray(reloaded.call(audio))
        np.testing.assert_array_equal(got, want)

    def test_chunked_export_matches_whole_batch(self, tmp_path):
        """chunk=N bakes the microbatched scan into the artifact; scores
        equal the whole-batch export (the AST serving knee lever carried
        into deployment)."""
        model, transform, variables = _tiny_scorer()
        whole = export_scorer(model, transform, variables, WIN, batch_size=4)
        chunked = export_scorer(
            model, transform, variables, WIN, batch_size=4, chunk=2
        )
        path = os.path.join(tmp_path, "chunked.adfx")
        save_artifact(chunked, path, {"win": WIN, "chunk": 2})
        reloaded, meta = load_artifact(path)
        assert meta["chunk"] == 2

        rng = np.random.RandomState(1)
        audio = jnp.asarray(rng.randn(4, 1, WIN).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(reloaded.call(audio)),
            np.asarray(whole.call(audio)),
            rtol=1e-6,
        )

    def test_chunk_requires_concrete_batch(self):
        model, transform, variables = _tiny_scorer()
        with pytest.raises(ValueError, match="concrete batch_size"):
            export_scorer(
                model, transform, variables, WIN, batch_size=None, chunk=2
            )

    def test_symbolic_batch_serves_any_size(self, tmp_path):
        model, transform, variables = _tiny_scorer()
        exported = export_scorer(
            model, transform, variables, WIN, batch_size=None
        )
        path = os.path.join(tmp_path, "scorer.adfx")
        save_artifact(exported, path, {"win": WIN})
        reloaded, meta = load_artifact(path)
        assert meta["in_shape"][0] == "b"

        score = make_score_fn(model, transform, variables)
        rng = np.random.RandomState(1)
        for b in (2, 5):
            audio = jnp.asarray(rng.randn(b, 1, WIN).astype(np.float32))
            np.testing.assert_array_equal(
                np.asarray(reloaded.call(audio)), np.asarray(score(audio))
            )

    def test_bad_magic_rejected(self, tmp_path):
        path = os.path.join(tmp_path, "junk.adfx")
        with open(path, "wb") as fh:
            fh.write(b"not an artifact")
        with pytest.raises(ValueError, match="not an ADFX"):
            load_artifact(path)


class TestExportCLI:
    def test_bundled_snapshot_export_check(self, tmp_path, capsys):
        """End-to-end: bundled reference stft DCNN checkpoint -> portable
        symbolic-batch artifact; --check compares the reloaded artifact
        against the in-process scorer on a random batch."""
        snaps = glob.glob("/root/reference/models/model_stft_*.pt")
        if not snaps:
            pytest.skip("bundled reference artifacts unavailable")
        out = os.path.join(tmp_path, "stft_dcnn.adfx")
        main([snaps[0], out, "--xla-wpt", "--check"])
        stdout = capsys.readouterr().out
        assert "check ok" in stdout

        reloaded, meta = load_artifact(out)
        assert meta["model"] == "DCNN"
        assert meta["transform"] == "stft"
        assert meta["portable"] is True
        assert meta["win"] == 22050
        # symbolic batch: the artifact serves any batch size
        assert meta["in_shape"] == ["b", "1", "22050"]
