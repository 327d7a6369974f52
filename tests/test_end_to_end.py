"""End-to-end smoke test: synthetic corpus -> index -> train -> eval -> resume.

The reference has no end-to-end training test (SURVEY.md §4 gap); this one
builds a tiny WaveFake-style directory layout (``A_real`` / ``B_fake``
prefix-labeled dirs, cf. reference tests/new_data), runs the full pipeline —
native wav decode, frame index with the reference cache format, WPT
transform, normalization, DCNN training over the virtual 8-device mesh,
EER/accuracy evaluation, snapshot save — and resumes from the snapshot.
"""

import os
import wave

import numpy as np
import pytest

from audiodeepfake_detection_tpu.data.dataset import get_custom_dataset
from audiodeepfake_detection_tpu.data.loader import FrameLoader
from audiodeepfake_detection_tpu.utils.config import default_config


def _write_wav(path, samples, sr=22050):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        pcm = np.clip(samples * 32767, -32768, 32767).astype("<i2")
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake")
    rng = np.random.RandomState(0)
    sr = 22050
    for dirname, kind in (("A_real", "tone"), ("B_fbmelgan", "noise")):
        d = root / dirname
        d.mkdir()
        for i in range(4):
            t = np.arange(4 * sr) / sr
            if kind == "tone":
                x = 0.5 * np.sin(2 * np.pi * (300 + 50 * i) * t)
            else:
                x = 0.3 * rng.randn(4 * sr)
            _write_wav(d / f"clip{i}.wav", x.astype(np.float32), sr)
    return root


@pytest.fixture(scope="module")
def args(corpus, tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("log"))
    a = default_config()
    a.update(
        data_path=str(corpus),
        save_path=str(tmp_path_factory.mktemp("meta")),
        data_prefix=str(corpus) + "/fake_22050_22050_0.7_fbmelgan",
        log_dir=log_dir,
        transform="packets",
        wavelet="haar",
        num_of_scales=256,
        log_scale=True,
        power=2.0,
        sample_rate=22050,
        seconds=1,
        batch_size=8,
        epochs=1,
        learning_rate=4e-4,
        weight_decay=1e-3,
        model="modules",
        module="DCNN",
        kernel1=3,
        ochannels1=8,
        ochannels2=8,
        ochannels3=12,
        ochannels4=16,
        ochannels5=4,
        flattend_size=320,
        time_dim_add=1,
        validation_interval=1,
        ckpt_every=1,
        calc_normalization=True,
        only_use=["real", "fbmelgan"],
        limit_train=(100, 100, 100),
        cross_data_path=None,
        get_details=False,
        seed=0,
    )
    os.makedirs(log_dir + "/models", exist_ok=True)
    os.makedirs(log_dir + "/norms", exist_ok=True)
    return a


class TestDatasetIndex:
    def test_labels_and_splits(self, corpus, args):
        ds = get_custom_dataset(
            data_path=str(corpus),
            ds_type="train",
            only_use=["real", "fbmelgan"],
            save_path=args.save_path,
            limit=100,
            resample_rate=22050,
            seconds=1,
        )
        # 4 files x 4 frames = 16 per label; train split = int(0.7*16) = 11
        assert len(ds) == 22
        labels = {int(r[3]) for r in ds.audio_data}
        assert labels == {0, 1}
        assert ds.label_names == {0: "real", 1: "fbmelgan"}
        # cache file in the reference's naming scheme
        assert os.path.exists(
            os.path.join(args.save_path, "dataset_real-fbmelgan_meta_1sec_train.npy")
        )

    def test_loader_batch_shapes(self, corpus, args):
        ds = get_custom_dataset(
            data_path=str(corpus),
            ds_type="train",
            only_use=["real", "fbmelgan"],
            save_path=args.save_path,
            limit=100,
            resample_rate=22050,
            seconds=1,
        )
        loader = FrameLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
        batches = list(loader.epoch(0))
        assert len(batches) == 5  # 22 // 4
        b = batches[0]
        assert b["audio"].shape == (4, 1, 22050)
        assert b["label"].shape == (4,)
        assert np.abs(b["audio"]).max() > 0


class TestEndToEnd:
    def test_train_eval_snapshot_resume(self, args):
        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        trainer = run_experiment(args)
        assert len(trainer.loss_list) == 2  # one epoch: 22 frames // batch 8
        acc, eer = trainer.test_results[0], trainer.test_results[1]
        assert 0.0 <= acc <= 1.0 and 0.0 <= eer <= 1.0
        assert os.path.exists(trainer.snapshot_path)
        # full-state checkpoint: orbax dir (or pickle fallback)
        assert os.path.exists(trainer.orbax_path) or os.path.exists(
            trainer.snapshot_path + ".state.pkl"
        )

        # normalization stats were cached in the reference's pickle scheme
        norm_files = os.listdir(args.log_dir + "/norms")
        assert any(f.endswith("_mean_std.pkl") for f in norm_files)

        # ... and shipped as a sidecar next to the snapshot, making the .pt
        # a complete serving artifact (auto-loaded by the scorer)
        import pickle as _pickle

        with open(trainer.snapshot_path + ".norm.pkl", "rb") as fh:
            side_mean, side_std = _pickle.load(fh)
        assert np.isfinite(side_mean).all() and (np.asarray(side_std) > 0).all()

        # reload: only_testing mode consumes the snapshot
        args2 = args.copy()
        args2.only_testing = True
        trainer2 = run_experiment(args2)
        assert trainer2.epochs_run == 1  # completed count (saved at epoch 0)
        assert len(trainer2.test_results) == 4

        # --resume on a COMPLETED run must be a no-op — nothing retrains
        # (resuming continues at epoch saved+1; re-running the snapshot
        # epoch would apply its gradients twice).  The reference saves
        # EPOCHS_RUN but can never continue a run at all
        # (train_classifier.py:1028).
        args3 = args.copy()
        args3.resume = True
        trainer3 = run_experiment(args3)
        assert int(np.asarray(trainer3.state.step)) == 2

        # crash-resume: simulate a 2-epoch run interrupted after epoch 0
        # by renaming the snapshots to the _2e_ names; --resume trains
        # ONLY epoch 1 (+2 steps)
        import shutil

        base = trainer.snapshot_path[: -len(".pt")]
        base2 = base.replace("_1e_", "_2e_")
        shutil.copy(trainer.snapshot_path, base2 + ".pt")
        if os.path.isdir(base + ".orbax"):
            shutil.copytree(base + ".orbax", base2 + ".orbax")
        elif os.path.exists(trainer.snapshot_path + ".state.pkl"):
            shutil.copy(
                trainer.snapshot_path + ".state.pkl",
                base2 + ".pt.state.pkl",
            )
        args4 = args.copy()
        args4.resume = True
        args4.epochs = 2
        trainer4 = run_experiment(args4)
        assert int(np.asarray(trainer4.state.step)) == 4


class TestConvergence:
    def test_training_reaches_full_accuracy(self, corpus, args):
        """The full driver (normalization, loaders, fused step with folded
        BN + custom-VJP first conv) separates tone-vs-noise to 100%/EER 0
        within 25 epochs — also validated on real TPU hardware (r2)."""
        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        args2 = args.copy()
        args2.update(
            epochs=25,
            validation_interval=100,  # skip mid-run validation for speed
            ckpt_every=100,
            log_dir=args.log_dir + "/conv",
        )
        import os

        os.makedirs(args2.log_dir + "/models", exist_ok=True)
        trainer = run_experiment(args2)
        acc, eer = trainer.test_results[0], trainer.test_results[1]
        assert acc == 1.0
        assert eer == 0.0

    def test_speed_path_driver_smoke(self, corpus, args):
        """The production SPEED configuration end-to-end on the virtual
        mesh: bf16 activations + fused Pallas layer-1 kernel, shard_map'd
        over the 8 devices (config -> factory -> mesh-threaded model).
        Also validated on real TPU hardware (r2): acc 1.0 / EER 0."""
        import os

        from audiodeepfake_detection_tpu.train.experiment import run_experiment
        from audiodeepfake_detection_tpu.parallel.mesh import get_mesh

        args2 = args.copy()
        args2.update(
            epochs=1,
            validation_interval=100,
            ckpt_every=100,
            log_dir=args.log_dir + "/speed",
            dtype="bfloat16",
            fused_layer1=True,
        )
        os.makedirs(args2.log_dir + "/models", exist_ok=True)
        trainer = run_experiment(args2, mesh=get_mesh())
        assert trainer.model.fused_layer1 is True
        assert trainer.model.mesh is not None and trainer.model.mesh.size == 8
        acc, eer = trainer.test_results[0], trainer.test_results[1]
        assert 0.0 <= acc <= 1.0
        assert np.isfinite(trainer.loss_list[-1][1] if isinstance(
            trainer.loss_list[-1], (tuple, list)) else trainer.loss_list[-1])


class TestIntegratedGradientsDriver:
    def test_only_ig_mode(self, corpus, args):
        """--only-ig end-to-end: train one epoch, reload the snapshot, and
        accumulate attribution means over the cross test set (device-side
        accumulation, int16-safe transform input, lead-only save)."""
        import os

        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        args2 = args.copy()
        args2.update(
            epochs=1,
            validation_interval=100,
            ckpt_every=1,
            log_dir=args.log_dir + "/ig",
            cross_data_path=str(corpus),
            cross_sources=["real", "fbmelgan"],
            ig_times_per_target=2,
        )
        os.makedirs(args2.log_dir + "/models", exist_ok=True)
        run_experiment(args2)  # produces the snapshot

        args3 = args2.copy()
        args3.only_ig = True
        run_experiment(args3)
        plots = os.listdir(args2.log_dir + "/plots")
        assert any(f.endswith("_integrated_gradients.npy") for f in plots)
        assert any(f.endswith("_mean_images.npy") for f in plots)
        ig_file = [f for f in plots if f.endswith("_integrated_gradients.npy")][0]
        ig = np.load(os.path.join(args2.log_dir, "plots", ig_file))
        assert np.isfinite(ig).all() and np.abs(ig).max() > 0

    def test_only_ig_without_cross_data_raises(self, corpus, args):
        import os

        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        args2 = args.copy()
        args2.update(
            epochs=1, validation_interval=100, ckpt_every=1,
            log_dir=args.log_dir + "/ig_err", cross_data_path=None,
        )
        os.makedirs(args2.log_dir + "/models", exist_ok=True)
        run_experiment(args2)
        args3 = args2.copy()
        args3.only_ig = True
        with pytest.raises(RuntimeError, match="cross"):
            run_experiment(args3)


class TestPredict:
    def test_score_files(self, corpus):
        import jax

        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.train.predict import score_files

        model = DCNN(
            time_dim=1,
            ochannels1=4,
            ochannels2=4,
            ochannels3=6,
            ochannels4=8,
            ochannels5=4,
        )

        def transform(audio):
            # tiny geometry: 2048-sample frames keep the DCNN valid
            return packet_image(audio, "haar", level=8, log_scale=True)

        x = np.zeros((2, 1, 2048), np.float32)
        variables = model.init(jax.random.key(0), transform(x), train=False)
        wavs = sorted(str(p) for p in (corpus / "A_real").glob("*.wav"))[:2]
        scores = score_files(
            model,
            transform,
            variables,
            wavs,
            sample_rate=22050,
            seconds=2048 / 22050,
            batch_size=8,
        )
        assert set(scores) == set(wavs)
        for v in scores.values():
            assert 0.0 <= v <= 1.0


class TestASTDriver:
    def test_ast_end_to_end(self, corpus, args, monkeypatch):
        """AST through the full driver: factory "modules" registry,
        geometry plumbed from the probed input_dim, train one epoch on the
        virtual mesh, snapshot saved in the trained-AST .pt layout and
        consumed by only_testing (reference reaches AST as a config-injected
        module class, models.py:497-536 + 760-765)."""
        import os

        from audiodeepfake_detection_tpu.models import ast as ast_mod
        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        # a miniature backbone so the e2e stays fast on the 1-core host;
        # geometry/plumbing are size-independent
        monkeypatch.setitem(
            ast_mod._SIZES, "test32", dict(embed_dim=32, depth=2, num_heads=2)
        )
        args2 = args.copy()
        args2.update(
            module="AST",
            ast_model_size="test32",
            flattend_size=None,  # fall back to the probed input_dim time axis
            epochs=1,
            validation_interval=100,
            ckpt_every=100,
            log_dir=args.log_dir + "/ast",
        )
        os.makedirs(args2.log_dir + "/models", exist_ok=True)
        trainer = run_experiment(args2)
        assert trainer.model.get_name() == "AST"
        # packets level 8 of 1 s @ 22050 (haar): (F, T) = (256, 87)
        assert trainer.model.input_fdim == 256
        assert trainer.model.input_tdim == 87
        acc, eer = trainer.test_results[0], trainer.test_results[1]
        assert 0.0 <= acc <= 1.0
        # the .pt snapshot exists in the trained-AST layout
        import torch

        blob = torch.load(trainer.snapshot_path, weights_only=False)
        assert "v.patch_embed.proj.weight" in blob["MODEL_STATE"]
        assert "mlp_head.1.weight" in blob["MODEL_STATE"]

        # reload through only_testing with the orbax dir removed: forces
        # the .pt path, exercising the trainer's AST importer
        import shutil

        shutil.rmtree(trainer.snapshot_path[: -len(".pt")] + ".orbax")
        args3 = args2.copy()
        args3.only_testing = True
        trainer2 = run_experiment(args3)
        assert len(trainer2.test_results) == 4


class TestPredictCLI:
    """Standalone scoring CLI over the bundled reference checkpoints."""

    SNAP = "/root/reference/models"
    SAMPLES = "/root/reference/audio-samples/classification_examples"

    def test_parse_model_file_roundtrip(self):
        from audiodeepfake_detection_tpu.utils.naming import (
            experiment_model_file,
            parse_model_file,
        )

        a = default_config()
        a.update(
            data_prefix="x/fake_22050_22050_0.7_fbmelgan",
            transform="packets",
            wavelet="sym5",
            hop_length=220,
            window_size=22050,
            num_of_scales=256,
            f_min=1.0,
            f_max=11025.0,
            only_use=["real", "fbmelgan"],
            seconds=1,
            seed=3,
            epochs=10,
        )
        path = experiment_model_file(a, "/tmp", "DCNN") + ".pt"
        cfg = parse_model_file(path)
        for key in (
            "transform", "wavelet", "hop_length", "sample_rate",
            "num_of_scales", "f_min", "f_max", "learning_rate",
            "weight_decay", "batch_size", "nclasses", "epochs", "power",
            "seed",
        ):
            assert cfg[key] == a[key], key
        assert cfg.model_name == "DCNN"
        assert cfg.seconds == float(a.seconds)
        assert cfg.generator == "fbmelgan"

    def test_score_bundled_checkpoint_on_samples(self, capsys):
        import glob as _glob

        paths = _glob.glob(f"{self.SNAP}/model_stft_*.pt")
        wavs = sorted(_glob.glob(f"{self.SAMPLES}/*.wav"))[:2]
        if not paths or not wavs:
            pytest.skip("bundled reference artifacts unavailable")
        from audiodeepfake_detection_tpu.train.predict import main

        main([paths[0], *wavs, "--batch-size", "8"])
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == len(wavs)
        for line, wav in zip(out, wavs):
            score, path = line.split("\t")
            assert path == wav
            assert 0.0 <= float(score) <= 1.0

    def test_bundled_checkpoint_discriminates_real_data(self):
        """Real-data validation: the imported reference sym5 checkpoint,
        fed through OUR WPT + self-estimated normalization, separates the
        bundled real LJSpeech clip from actual GAN-generated clips
        (melgan/mbmelgan cross-generators).  The closest real-corpus
        check possible without the LJSpeech/WaveFake corpus in-image."""
        import glob as _glob

        snaps = _glob.glob(f"{self.SNAP}/model_packetssym5_*.pt")
        real = sorted(_glob.glob("/root/reference/tests/data/real/*.wav"))
        fake = sorted(_glob.glob(f"{self.SAMPLES}/[BD]_*.wav"))[:3]
        if not snaps or not real or not fake:
            pytest.skip("bundled reference artifacts unavailable")
        from audiodeepfake_detection_tpu.train.predict import (
            build_scorer_from_snapshot,
            score_files,
        )

        model, transform, variables, cfg = build_scorer_from_snapshot(
            snaps[0], expect_self_norm=True
        )
        scores = score_files(
            model, transform, variables, real + fake,
            sample_rate=int(cfg.sample_rate), seconds=float(cfg.seconds),
            batch_size=16, self_norm=True,
        )
        for p in real:
            assert scores[p] < 0.5, (p, scores[p])
        for p in fake:
            assert scores[p] > 0.5, (p, scores[p])

    def test_stft_checkpoint_ranks_real_below_fakes(self):
        """The imported stft checkpoint through OUR spectrogram pipeline:
        with self-estimated (non-corpus) normalization the softmax
        threshold shifts, but the real clip's mean fake-logit margin sits
        >=4 logits below every GAN clip's — measured +5.9 (real) vs
        +11.0..+20.3 (melgan/mbmelgan/lmelgan/lbigvgan/fbmelgan).  The
        coif4 checkpoint is deliberately NOT locked here: under self-norm
        stats it saturates to 'real' on every clip (margins -58..-84, no
        rank order) — it needs true training-corpus stats, which the
        reference does not bundle (docs/parity.md)."""
        import glob as _glob

        snaps = _glob.glob(f"{self.SNAP}/model_stft_*.pt")
        real = sorted(_glob.glob("/root/reference/tests/data/real/*.wav"))
        fake = sorted(_glob.glob(f"{self.SAMPLES}/*.wav")) + sorted(
            _glob.glob(
                "/root/reference/tests/data/ljspeech_full_band_melgan/*.wav"
            )
        )[:1]
        if not snaps or not real or not fake:
            pytest.skip("bundled reference artifacts unavailable")
        from audiodeepfake_detection_tpu.train.predict import (
            build_scorer_from_snapshot,
            score_files,
        )

        model, transform, variables, cfg = build_scorer_from_snapshot(
            snaps[0], expect_self_norm=True
        )
        # rank on mean logit margins, not saturated softmax probabilities
        scores = score_files(
            model, transform, variables, real + fake,
            sample_rate=int(cfg.sample_rate), seconds=float(cfg.seconds),
            batch_size=16, self_norm=True, aggregate="mean",
            output="margin",
        )
        worst_fake = min(scores[p] for p in fake)
        for p in real:
            assert scores[p] < worst_fake - 4.0, (scores[p], worst_fake)
