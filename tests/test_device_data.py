"""Device-resident training data (``device_data=True``).

The resident path must be a pure transport change: the whole frame set
uploads to HBM once, dispatches ship only ``[G, B]`` int32 indices, and the
training trajectory (params, optimizer moments, BN stats, PRNG stream,
batch order) is IDENTICAL to the streaming loader's.  The reference has no
counterpart — it re-uploads every batch every epoch (reference:
src/audiofakedetect/train_classifier.py:910-952).
"""

import os
import wave

import numpy as np
import pytest


def _write_wav(path, samples, sr=22050):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        pcm = np.clip(samples * 32767, -32768, 32767).astype("<i2")
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("resident_corpus")
    rng = np.random.RandomState(7)
    sr = 22050
    for dirname, kind in (("A_real", "tone"), ("B_fbmelgan", "noise")):
        d = root / dirname
        d.mkdir()
        for i in range(4):
            t = np.arange(4 * sr) / sr
            if kind == "tone":
                x = 0.5 * np.sin(2 * np.pi * (250 + 40 * i) * t)
            else:
                x = 0.3 * rng.randn(4 * sr)
            _write_wav(d / f"clip{i}.wav", x.astype(np.float32), sr)
    return root


def _args(corpus, tmp_path_factory, tag):
    from audiodeepfake_detection_tpu.utils.config import default_config

    log_dir = str(tmp_path_factory.mktemp(f"log_{tag}"))
    a = default_config()
    a.update(
        data_path=str(corpus),
        save_path=str(tmp_path_factory.mktemp(f"meta_{tag}")),
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
        epochs=2,
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
        validation_interval=100,
        ckpt_every=100,
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


class TestResidentStep:
    def test_resident_scan_equals_streaming_scan(self):
        """make_resident_multi_train_step over an HBM tensor + index blocks
        must match make_multi_train_step fed the gathered host batches."""
        import jax
        import jax.numpy as jnp

        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.parallel.mesh import get_mesh
        from audiodeepfake_detection_tpu.train.steps import (
            create_train_state,
            make_multi_train_step,
            make_optimizer,
            make_resident_multi_train_step,
            stack_batches,
        )

        model = DCNN(
            time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
            ochannels4=8, ochannels5=2, with_dropout=False,
        )

        def transform(audio):
            return packet_image(audio, "haar", level=8, log_scale=True)

        tx = make_optimizer(4e-4, 1e-3)
        rng = np.random.RandomState(0)
        n, b, g = 32, 8, 3
        audio_all = rng.randn(n, 1, 2048).astype(np.float32)
        labels_all = rng.randint(0, 2, n).astype(np.int32)
        idx = rng.permutation(n)[: g * b].astype(np.int32).reshape(g, b)

        img = transform(jnp.asarray(audio_all[:2]))
        s_stream = create_train_state(model, tx, img, seed=0)
        s_res = create_train_state(model, tx, img, seed=0)

        batches = [
            {"audio": audio_all[row], "label": labels_all[row]} for row in idx
        ]
        stream = make_multi_train_step(model, transform, tx)
        s_stream, st_stream = stream(s_stream, stack_batches(batches))

        mesh = get_mesh()
        resident = make_resident_multi_train_step(model, transform, tx, mesh)
        s_res, st_res = resident(
            s_res, jnp.asarray(audio_all), jnp.asarray(labels_all), idx
        )

        # the gather-fed program fuses differently than the host-fed one,
        # reordering float accumulations (BN moments, means) — identical
        # math, not identical rounding; 3 Adam steps amplify to ~5e-5 rel
        jax.tree.map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-4, atol=1e-6
            ),
            (s_stream.params, s_stream.batch_stats, s_stream.opt_state),
            (s_res.params, s_res.batch_stats, s_res.opt_state),
        )
        np.testing.assert_allclose(
            np.asarray(st_stream["loss"]), np.asarray(st_res["loss"]),
            rtol=1e-4,
        )
        assert int(s_res.step) == g

    def test_int16_resident_tensor(self):
        """int16 PCM resident data converts in-graph (audio_to_float)."""
        import jax.numpy as jnp

        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.train.steps import (
            audio_to_float,
            create_train_state,
            make_optimizer,
            make_resident_multi_train_step,
        )

        model = DCNN(
            time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
            ochannels4=8, ochannels5=2, with_dropout=False,
        )

        def transform(audio):
            return packet_image(audio, "haar", level=8, log_scale=True)

        tx = make_optimizer(4e-4, 1e-3)
        rng = np.random.RandomState(1)
        pcm = rng.randint(-2000, 2000, (16, 1, 2048)).astype(np.int16)
        labels = rng.randint(0, 2, 16).astype(np.int32)
        idx = np.arange(8, dtype=np.int32).reshape(1, 8)

        img = transform(audio_to_float(jnp.asarray(pcm[:2])))
        state = create_train_state(model, tx, img, seed=0)
        step = make_resident_multi_train_step(model, transform, tx)
        state, stats = step(
            state, jnp.asarray(pcm), jnp.asarray(labels), idx
        )
        assert np.isfinite(float(stats["loss"][0]))


class TestResidentTrainer:
    def test_trajectory_matches_streaming_loader(
        self, corpus, tmp_path_factory
    ):
        """Full driver, 2 epochs: device_data=True must land on the same
        weights as the streaming path (same shuffle via loader._order, same
        step math) — and actually run the resident path."""
        import jax

        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        t_host = run_experiment(_args(corpus, tmp_path_factory, "host"))

        a_res = _args(corpus, tmp_path_factory, "res")
        a_res.device_data = True
        t_res = run_experiment(a_res)

        assert t_res._resident is not None, "resident path did not run"
        assert t_res._resident.n == len(t_res.train_loader.dataset)
        # 2 epochs x (22 frames // batch 8) steps
        assert int(np.asarray(t_res.state.step)) == 4
        # same batch sequence and step math; rounding differs because the
        # in-graph gather changes XLA fusion (see TestResidentStep note)
        jax.tree.map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-5
            ),
            t_host.state.params,
            t_res.state.params,
        )
        losses_host = [row[2] for row in t_host.loss_list]
        losses_res = [row[2] for row in t_res.loss_list]
        np.testing.assert_allclose(losses_host, losses_res, rtol=1e-3)

    def test_chained_resident_dispatch(self, corpus, tmp_path_factory):
        """steps_per_call groups compose with device_data (G-step scan per
        dispatch, remainder group compiled separately)."""
        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        a = _args(corpus, tmp_path_factory, "chain")
        a.device_data = True
        a.steps_per_call = 2
        a.epochs = 1
        trainer = run_experiment(a)
        # 22 frames // 8 = 2 full batches -> one [2, 8] dispatch
        assert int(np.asarray(trainer.state.step)) == 2
        assert trainer.resident_train_step is not None

    def test_resident_eval_matches_streaming(
        self, corpus, tmp_path_factory
    ):
        """Resident eval (one dispatch, -1 tail sentinels) must produce the
        SAME metrics and true-index dumps as the streaming loop on the same
        state — including the padded final partial batch."""
        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        a = _args(corpus, tmp_path_factory, "ev")
        a.device_data = True
        a.epochs = 1
        a.get_details = True  # test loaders emit indices
        trainer = run_experiment(a)
        assert any(
            r is not None for r in trainer._resident_eval_cache.values()
        ), "no eval set went resident during testing"

        res_acc, res_eer = trainer.val_test_loop(
            trainer.test_loader, name="rescheck"
        )
        res_idx = trainer.current_true_indices.get("rescheck")
        trainer._device_data = False  # force the streaming loop
        st_acc, st_eer = trainer.val_test_loop(
            trainer.test_loader, name="streamcheck"
        )
        st_idx = trainer.current_true_indices.get("streamcheck")
        assert res_acc == st_acc
        np.testing.assert_allclose(res_eer, st_eer, atol=1e-9)
        assert (res_idx is None) == (st_idx is None)
        if st_idx is not None:
            np.testing.assert_array_equal(res_idx, st_idx)

    def test_eval_budget_overflow_streams(self, corpus, tmp_path_factory):
        """An eval set that would overflow the cumulative HBM budget falls
        back to streaming (None in the cache), not a crash."""
        from audiodeepfake_detection_tpu.data.loader import FrameLoader
        from audiodeepfake_detection_tpu.train import device_data as dd
        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        a = _args(corpus, tmp_path_factory, "budget")
        a.device_data = True
        a.epochs = 1
        trainer = run_experiment(a)

        orig = dd.ResidentData._check_budget

        def tiny_budget(nbytes):
            raise ValueError("resident data (test) exceeds 60% of budget")

        dd.ResidentData._check_budget = staticmethod(tiny_budget)
        try:
            loader = FrameLoader(
                trainer.test_loader.dataset, 8, use_frame_cache=False
            )
            out = trainer.val_test_loop(loader, name="overflow")
        finally:
            dd.ResidentData._check_budget = staticmethod(orig)
        assert trainer._resident_eval_cache[loader] is None
        assert 0.0 <= out[0] <= 1.0  # streamed result, not a crash

    def test_guards(self, tmp_path):
        """device_data is DP-only and needs a drop_last loader."""
        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.train.trainer import Trainer
        from audiodeepfake_detection_tpu.utils.config import default_config

        args = default_config()
        args.update(device_data=True, fsdp=True)
        model = DCNN(
            time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
            ochannels4=8, ochannels5=2,
        )
        with pytest.raises(ValueError, match="device_data"):
            Trainer(
                model, lambda x: x, args, snapshot_path=str(tmp_path / "s")
            )

    def test_vectorized_sweep_falls_back_serially(
        self, corpus, tmp_path_factory
    ):
        """vmap_seeds + device_data: the sweep guard rejects the group and
        the driver's serial fallback (which honors device_data) runs it."""
        from audiodeepfake_detection_tpu.train.sweep import (
            VectorizedSeedSweep,
        )
        from audiodeepfake_detection_tpu.train.trainer import Trainer
        from audiodeepfake_detection_tpu.models import DCNN

        a = _args(corpus, tmp_path_factory, "vmap")
        a.device_data = True

        class _Shadow:
            pass

        model = DCNN(
            time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
            ochannels4=8, ochannels5=2,
        )
        sh = _Shadow()
        sh.args = a
        sh.model = model
        sh.transform = lambda x: x
        sh.tx = None
        sh.mesh = None
        sh.steps_per_call = 1
        with pytest.raises(ValueError, match="device_data"):
            VectorizedSeedSweep([sh], [object()])


class TestStreamedChainedDispatch:
    def test_double_buffered_groups_equal_single_steps(
        self, corpus, tmp_path_factory
    ):
        """The streamed (non-resident) chained path — now double-buffered:
        superbatch G+1's device_put is issued before dispatch G (round-4
        verdict next #8) — must land on exactly the same weights as the
        plain single-step driver over the same loader order, including the
        remainder batch that doesn't fill a group."""
        import jax

        from audiodeepfake_detection_tpu.train.experiment import run_experiment

        a1 = _args(corpus, tmp_path_factory, "sbuf1")
        a1.batch_size = 4  # 22 frames -> 5 full batches: 2 groups + 1 tail
        a1.epochs = 1
        t_single = run_experiment(a1)

        a2 = _args(corpus, tmp_path_factory, "sbuf2")
        a2.batch_size = 4
        a2.epochs = 1
        a2.steps_per_call = 2
        t_multi = run_experiment(a2)

        assert t_multi.multi_train_step is not None
        assert int(np.asarray(t_multi.state.step)) == int(
            np.asarray(t_single.state.step)
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            t_single.state.params,
            t_multi.state.params,
        )
