"""Metric-aggregation tests, mirroring the reference's simulated-2-rank style
(reference: tests/test_trainer.py — hand-built gathered dicts standing in for
``all_gather_object`` results)."""

import numpy as np
import pytest

from audiodeepfake_detection_tpu.train.metrics import (
    calculate_acc_dict,
    calculate_acc_label,
    calculate_eer,
    dense_counts_to_dicts,
)


class TestAccuracyCalculation:
    def test_key_error(self):
        count_dict_gathered = [{1: 1}, {2: 1}]
        ok_dict_gathered = [{1: [False], 2: []}]
        with pytest.raises(KeyError):
            calculate_acc_label(count_dict_gathered, ok_dict_gathered, key=2)

    def test_result_type(self):
        assert isinstance(
            calculate_acc_label([{1: 1}], [{1: [], 2: []}], key=1), float
        )
        assert isinstance(
            calculate_acc_label([{1: 1}], [{1: [True], 2: []}], key=1), float
        )

    def test_two_rank_accuracy(self):
        count = [{1: 3, 3: 2, 2: 1, 0: 1}, {1: 3, 3: 1, 2: 1, 0: 2}]
        ok = [
            {1: [True, False, False], 3: [True, True], 2: [True], 0: [False]},
            {1: [True, True, False], 3: [True], 2: [True], 0: [False, False]},
        ]
        assert calculate_acc_label(count, ok, key=1) == pytest.approx(3 / 6)
        assert calculate_acc_label(count, ok, key=0) == pytest.approx(0.0)

    def test_acc_dict(self):
        count = [{1: 3, 3: 2, 2: 1, 0: 1}, {1: 3, 3: 1, 2: 1, 0: 2}]
        ok = [
            {1: [True, False, False], 3: [True, True], 2: [True], 0: [False]},
            {1: [True, True, False], 3: [False], 2: [True], 0: [False, False]},
        ]
        names = {0: "Zero", 1: "First", 2: "Second", 3: "Third"}
        out = calculate_acc_dict(names, [0, 1, 2, 3], ok, count)
        assert out == [
            ("Zero", 0.0),
            ("First", 0.5),
            ("Second", 1.0),
            ("Third", pytest.approx(2 / 3)),
        ]

    def test_dense_counts_roundtrip(self):
        ok = np.array([2, 0, 3])
        tot = np.array([4, 0, 3])
        ok_d, cnt_d = dense_counts_to_dicts(ok, tot)
        assert cnt_d == {0: 4, 2: 3}
        assert calculate_acc_label([cnt_d], [ok_d], 0) == pytest.approx(0.5)
        assert calculate_acc_label([cnt_d], [ok_d], 2) == pytest.approx(1.0)


class TestEER:
    def test_perfect_classifier(self):
        y = np.array([0, 0, 1, 1])
        s = np.array([0.1, 0.2, 0.8, 0.9])
        assert calculate_eer(y, s) == pytest.approx(0.0, abs=1e-9)

    def test_random_classifier_is_half(self):
        rng = np.random.RandomState(0)
        y = rng.randint(0, 2, 2000)
        s = rng.rand(2000)
        assert calculate_eer(y, s) == pytest.approx(0.5, abs=0.05)

    def test_argmax_decisions(self):
        # the reference feeds hard argmax decisions; EER then equals the
        # balanced error at that operating point
        y = np.array([0] * 50 + [1] * 50)
        pred = np.array([0] * 40 + [1] * 10 + [1] * 45 + [0] * 5)
        eer = calculate_eer(y, pred)
        assert 0.0 < eer < 0.5


class TestSafeEER:
    def test_single_class_reports_nan(self, capsys):
        from audiodeepfake_detection_tpu.train.metrics import safe_eer

        # an all-fake cross-generator eval dir is a legitimate input; the
        # reference crashes inside roc_curve/brentq here
        y = np.ones(16, dtype=int)
        s = np.random.RandomState(0).rand(16)
        assert np.isnan(safe_eer(y, s))
        assert "undefined" in capsys.readouterr().out

    def test_empty_reports_nan(self):
        from audiodeepfake_detection_tpu.train.metrics import safe_eer

        assert np.isnan(safe_eer(np.zeros(0), np.zeros(0)))

    def test_well_defined_matches_calculate_eer(self):
        from audiodeepfake_detection_tpu.train.metrics import safe_eer

        y = np.array([0, 0, 1, 1])
        s = np.array([0.1, 0.2, 0.8, 0.9])
        assert safe_eer(y, s) == pytest.approx(calculate_eer(y, s))


class TestMultiStep:
    def test_scan_steps_equal_single_steps(self):
        """make_multi_train_step(G) must evolve params/opt state/BN stats
        exactly like G sequential make_train_step calls."""
        import jax
        import jax.numpy as jnp

        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.train.steps import (
            create_train_state,
            make_multi_train_step,
            make_optimizer,
            make_train_step,
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
        batches = [
            {
                "audio": rng.randn(4, 1, 2048).astype(np.float32),
                "label": rng.randint(0, 2, 4).astype(np.int32),
            }
            for _ in range(3)
        ]
        img = transform(jnp.asarray(batches[0]["audio"]))
        s_single = create_train_state(model, tx, img, seed=0)
        s_multi = create_train_state(model, tx, img, seed=0)

        single = make_train_step(model, transform, tx)
        multi = make_multi_train_step(model, transform, tx)

        singles = []
        for b in batches:
            s_single, st = single(s_single, b)
            singles.append(st)
        s_multi, stacked = multi(s_multi, stack_batches(batches))

        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            s_single.params,
            s_multi.params,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            s_single.batch_stats,
            s_multi.batch_stats,
        )
        for g, st in enumerate(singles):
            np.testing.assert_allclose(
                float(st["loss"]), float(stacked["loss"][g]), rtol=1e-5
            )
        assert int(s_multi.step) == 3

    def test_scan_composes_with_fused_kernels(self):
        """lax.scan over the train step must compose with the Pallas fused
        layer-1 kernel (production speed config uses both)."""
        import jax.numpy as jnp

        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.train.steps import (
            create_train_state,
            make_multi_train_step,
            make_optimizer,
            stack_batches,
        )

        model = DCNN(
            time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
            ochannels4=8, ochannels5=2, with_dropout=False,
            fused_layer1=True,
        )

        def transform(audio):
            return packet_image(audio, "haar", level=8, log_scale=True)

        tx = make_optimizer(4e-4, 1e-3)
        rng = np.random.RandomState(1)
        batches = [
            {
                "audio": rng.randn(4, 1, 2048).astype(np.float32),
                "label": rng.randint(0, 2, 4).astype(np.int32),
            }
            for _ in range(2)
        ]
        img = transform(jnp.asarray(batches[0]["audio"]))
        state = create_train_state(model, tx, img, seed=0)
        multi = make_multi_train_step(model, transform, tx)
        state, stacked = multi(state, stack_batches(batches))
        losses = np.asarray(stacked["loss"], np.float32)
        assert losses.shape == (2,) and np.isfinite(losses).all()
        assert int(state.step) == 2


class TestInt16Batches:
    def test_train_and_eval_steps_accept_pcm(self):
        """int16 PCM batches (frame-cache emit mode) produce the same
        results as float32 batches — conversion happens in-graph."""
        import jax
        import jax.numpy as jnp

        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.train.steps import (
            create_train_state,
            make_eval_step,
            make_optimizer,
            make_train_step,
        )

        model = DCNN(
            time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
            ochannels4=8, ochannels5=2, with_dropout=False,
        )

        def transform(audio):
            return packet_image(audio, "haar", level=8, log_scale=True)

        tx = make_optimizer(4e-4, 1e-3)
        rng = np.random.RandomState(0)
        pcm = (rng.randn(4, 1, 2048) * 4000).astype(np.int16)
        b16 = {
            "audio": pcm,
            "label": rng.randint(0, 2, 4).astype(np.int32),
            "weight": np.ones(4, np.float32),
        }
        b32 = dict(b16, audio=pcm.astype(np.float32) / 32768.0)

        img = transform(jnp.asarray(b32["audio"]))
        s16 = create_train_state(model, tx, img, seed=0)
        s32 = create_train_state(model, tx, img, seed=0)
        step = make_train_step(model, transform, tx)
        s16, st16 = step(s16, b16)
        s32, st32 = step(s32, b32)
        np.testing.assert_allclose(
            float(st16["loss"]), float(st32["loss"]), rtol=1e-6
        )

        ev = make_eval_step(model, transform)
        r16 = ev(s16.params, s16.batch_stats, b16)
        r32 = ev(s16.params, s16.batch_stats, b32)
        np.testing.assert_allclose(
            np.asarray(r16["scores"]), np.asarray(r32["scores"]), rtol=1e-6
        )


class TestMultiEval:
    def test_scan_eval_equals_single_eval(self):
        import jax
        import jax.numpy as jnp

        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.train.steps import (
            create_train_state,
            make_eval_step,
            make_multi_eval_step,
            make_optimizer,
            stack_batches,
        )

        model = DCNN(
            time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
            ochannels4=8, ochannels5=2, with_dropout=False,
        )

        def transform(audio):
            return packet_image(audio, "haar", level=8, log_scale=True)

        rng = np.random.RandomState(0)
        batches = [
            {
                "audio": rng.randn(4, 1, 2048).astype(np.float32),
                "label": rng.randint(0, 3, 4).astype(np.int32),
                "weight": (rng.rand(4) > 0.2).astype(np.float32),
            }
            for _ in range(3)
        ]
        img = transform(jnp.asarray(batches[0]["audio"]))
        state = create_train_state(
            model, make_optimizer(4e-4, 1e-3), img, seed=0
        )
        single = make_eval_step(model, transform)
        multi = make_multi_eval_step(model, transform)
        stacked = multi(
            state.params, state.batch_stats, stack_batches(batches)
        )
        for g, b in enumerate(batches):
            res = single(state.params, state.batch_stats, b)
            got = jax.tree.map(lambda s, g=g: s[g], stacked)
            for key in res:
                np.testing.assert_allclose(
                    np.asarray(res[key]), np.asarray(got[key]), rtol=1e-6,
                    err_msg=key,
                )


def test_trainer_init_state_accepts_int16_batch():
    """Regression: with the frame cache's int16 batches, Trainer.init_state
    used to feed raw PCM into the transform — only the TPU Pallas WPT
    rejects the dtype, so this slipped past CPU tests."""
    from audiodeepfake_detection_tpu.models import DCNN
    from audiodeepfake_detection_tpu.ops.wpt import packet_image
    from audiodeepfake_detection_tpu.train.trainer import Trainer
    from audiodeepfake_detection_tpu.utils.config import default_config

    args = default_config()
    args.update(seed=0, learning_rate=4e-4, weight_decay=1e-3)
    model = DCNN(
        time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
        ochannels4=8, ochannels5=2,
    )

    def transform(audio):
        return packet_image(audio, "haar", level=8, log_scale=True)

    trainer = Trainer(model, transform, args, snapshot_path="/tmp/t16")
    batch = {
        "audio": (np.random.RandomState(0).randn(4, 1, 2048) * 4000).astype(
            np.int16
        ),
        "label": np.zeros(4, np.int32),
    }
    trainer.init_state(batch)
    assert trainer.state is not None


def _tiny_trainer(tmp_path, name="snap", **model_kw):
    from audiodeepfake_detection_tpu.models import DCNN
    from audiodeepfake_detection_tpu.ops.wpt import packet_image
    from audiodeepfake_detection_tpu.train.trainer import Trainer
    from audiodeepfake_detection_tpu.utils.config import default_config

    args = default_config()
    args.update(seed=0, learning_rate=4e-4, weight_decay=1e-3)
    model = DCNN(
        time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
        ochannels4=8, ochannels5=2, **model_kw,
    )

    def transform(audio):
        return packet_image(audio, "haar", level=8, log_scale=True)

    trainer = Trainer(
        model, transform, args, snapshot_path=str(tmp_path / name)
    )
    batch = {
        "audio": np.random.RandomState(0)
        .randn(4, 1, 2048)
        .astype(np.float32),
        "label": np.zeros(4, np.int32),
    }
    trainer.init_state(batch)
    return trainer


class TestSnapshotPathOverride:
    def test_explicit_path_wins_over_default_orbax(self, tmp_path):
        """Regression (round-2 review): load_snapshot(snapshot_path=...)
        silently restored the trainer's DEFAULT orbax dir whenever one
        existed, ignoring the explicit argument."""
        trainer = _tiny_trainer(tmp_path)
        trainer.save_snapshot(epoch=1)  # default path: snap.pt + snap.orbax

        # a second, different checkpoint at an explicit location
        default_pt, default_orbax = trainer.snapshot_path, trainer.orbax_path
        trainer.snapshot_path = str(tmp_path / "other.pt")
        trainer.orbax_path = str(tmp_path / "other.orbax")
        trainer.save_snapshot(epoch=5)
        trainer.snapshot_path, trainer.orbax_path = default_pt, default_orbax

        trainer.epochs_run = 0
        trainer.load_snapshot(str(tmp_path / "other.pt"))
        # epochs_run = completed count = saved epoch index + 1
        assert trainer.epochs_run == 6  # pre-fix: the default orbax's 2

        # no argument still restores the default checkpoint
        trainer.load_snapshot()
        assert trainer.epochs_run == 2

        # an explicit orbax directory path works too
        trainer.load_snapshot(str(tmp_path / "other.orbax"))
        assert trainer.epochs_run == 6


class TestZeroAlphaFusedGuard:
    def test_zero_alpha_import_disables_fused_kernels(self, tmp_path, capsys):
        """An imported checkpoint with a ReLU-style alpha == 0.0 cannot
        train through the fused kernels (dalpha recovery degenerates);
        the trainer must fall back to the unfused path."""
        import jax

        trainer = _tiny_trainer(tmp_path, name="za", fused_layer1=True)
        assert trainer.model.fused_layer1
        variables = {
            "params": jax.tree.map(np.asarray, trainer.state.params),
            "batch_stats": jax.tree.map(np.asarray, trainer.state.batch_stats),
        }
        variables["params"]["cnn_1"]["alpha"] = np.zeros_like(
            variables["params"]["cnn_1"]["alpha"]
        )
        trainer.load_variables(variables)
        assert trainer.model.fused_layer1 is False
        assert "unfused" in capsys.readouterr().out

    def test_zero_alpha_disables_fused_layer2_too(self, tmp_path, capsys):
        """Regression: the guard originally scanned only fused_layer1 and
        fused_pool, but the fused_layer2 kernel (ops/fused_conv2.py) has
        the same dalpha/alpha==0 degeneration on cnn_8's slope."""
        import jax

        trainer = _tiny_trainer(tmp_path, name="za2", fused_layer2=True)
        assert trainer.model.fused_layer2
        variables = {
            "params": jax.tree.map(np.asarray, trainer.state.params),
            "batch_stats": jax.tree.map(np.asarray, trainer.state.batch_stats),
        }
        variables["params"]["cnn_8"]["alpha"] = np.zeros_like(
            variables["params"]["cnn_8"]["alpha"]
        )
        trainer.load_variables(variables)
        assert trainer.model.fused_layer2 is False
        assert "unfused" in capsys.readouterr().out

    def test_nonzero_alpha_keeps_fused_kernels(self, tmp_path):
        trainer = _tiny_trainer(tmp_path, name="nz", fused_layer1=True)
        import jax

        variables = {
            "params": jax.tree.map(np.asarray, trainer.state.params),
            "batch_stats": jax.tree.map(np.asarray, trainer.state.batch_stats),
        }
        trainer.load_variables(variables)
        assert trainer.model.fused_layer1 is True


class TestTrueIndexDump:
    class _StubLoader:
        def __init__(self, table):
            self.dataset = type("DS", (), {"audio_data": table})()

    def _stub_trainer(self, with_cross):
        t = type("T", (), {})()
        t.current_true_indices = {
            "test known": np.array([0, 2]),
            "test unknown": np.array([1]),
        }
        t.test_loader = self._StubLoader(np.array([["k", 0, 1, 0]] * 3, object))
        t.cross_loader_test = (
            self._StubLoader(np.array([["x", 0, 1, 1]] * 2, object))
            if with_cross
            else None
        )
        return t

    def test_without_cross_loader_no_crash(self, tmp_path):
        """Regression (round-2 review): get_details with no cross set
        raised AttributeError on cross_loader_test.dataset."""
        from audiodeepfake_detection_tpu.train.experiment import (
            dump_true_indices,
        )
        from audiodeepfake_detection_tpu.utils.config import default_config

        args = default_config()
        args.update(log_dir=str(tmp_path), seed=0, get_details=True)
        out = dump_true_indices(args, self._stub_trainer(False), "m")
        blob = np.load(out, allow_pickle=True).item()
        assert "dataset" not in blob
        assert blob["dataset_known"].shape == (3, 4)
        np.testing.assert_array_equal(blob["known"], [0, 2])

    def test_known_indices_get_their_own_table(self, tmp_path):
        from audiodeepfake_detection_tpu.train.experiment import (
            dump_true_indices,
        )
        from audiodeepfake_detection_tpu.utils.config import default_config

        args = default_config()
        args.update(log_dir=str(tmp_path), seed=0, get_details=True)
        out = dump_true_indices(args, self._stub_trainer(True), "m")
        blob = np.load(out, allow_pickle=True).item()
        assert blob["dataset"].shape == (2, 4)  # reference layout: cross
        assert blob["dataset_known"].shape == (3, 4)


class TestTrainerPP:
    """pp_stages end-to-end through the Trainer: ('data','stage') mesh
    built automatically, GPipe step + scan-chained dispatch run, params
    stay in the replicated checkpoint layout, guards fire."""

    def _trainer(self, tmp_path, **extra):
        from audiodeepfake_detection_tpu.models.ast import ASTModel
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.train.trainer import Trainer
        from audiodeepfake_detection_tpu.utils.config import default_config

        args = default_config()
        overrides = dict(
            seed=0, learning_rate=4e-4, weight_decay=1e-3,
            pp_stages=2, pp_microbatches=2, steps_per_call=2,
        )
        overrides.update(extra)
        args.update(**overrides)
        model = ASTModel(
            model_size="tiny224", input_fdim=32, input_tdim=64
        )

        def transform(audio):
            return packet_image(audio, "haar", level=5, log_scale=True)

        trainer = Trainer(
            model, transform, args, snapshot_path=str(tmp_path / "pp")
        )
        batch = {
            "audio": np.random.RandomState(0)
            .randn(8, 1, 2048)
            .astype(np.float32),
            "label": np.tile([0, 1], 4).astype(np.int32),
        }
        return trainer, batch

    def test_pp_steps_run_through_trainer(self, tmp_path, eight_devices):
        import jax
        import numpy as np

        from audiodeepfake_detection_tpu.parallel.mesh import shard_batch
        from audiodeepfake_detection_tpu.train.steps import stack_batches

        trainer, batch = self._trainer(tmp_path)
        assert dict(trainer.mesh.shape) == {"data": 4, "stage": 2}
        trainer.init_state(batch)

        db = shard_batch(trainer.mesh, batch)
        state, stats = trainer.train_step(trainer.state, db)
        assert np.isfinite(float(stats["loss"]))
        # params stay in the ordinary replicated layout (PP shards the
        # block stack only inside the step)
        for p in jax.tree_util.tree_leaves(state.params):
            assert "stage" not in str(p.sharding.spec)

        group = shard_batch(
            trainer.mesh, stack_batches([batch, batch]), batch_axis=1
        )
        state, mstats = trainer.multi_train_step(state, group)
        assert mstats["loss"].shape == (2,)
        assert np.isfinite(np.asarray(mstats["loss"])).all()

    def test_pp_guards(self, tmp_path, eight_devices):
        import pytest

        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.train.trainer import Trainer
        from audiodeepfake_detection_tpu.utils.config import default_config

        args = default_config()
        args.update(
            seed=0, learning_rate=4e-4, weight_decay=1e-3, pp_stages=2
        )
        with pytest.raises(ValueError, match="embed/classify"):
            Trainer(
                DCNN(time_dim=1), lambda a: a, args,
                snapshot_path=str(tmp_path / "g1"),
            )

        with pytest.raises(ValueError, match="mutually exclusive"):
            self._trainer(tmp_path, fsdp=True)

        with pytest.raises(ValueError, match="does not divide"):
            self._trainer(tmp_path, pp_stages=3)

        # the pipelined encoder runs deterministically; a configured
        # dropout rate must refuse rather than silently train without it
        from audiodeepfake_detection_tpu.models.ast import ASTModel

        model = ASTModel(
            model_size="tiny224", input_fdim=32, input_tdim=64,
            drop_rate=0.1,
        )
        with pytest.raises(ValueError, match="without dropout"):
            Trainer(
                model, lambda a: a, args,
                snapshot_path=str(tmp_path / "gd"),
            )


class TestTrainerFSDP:
    """The fsdp config flag end-to-end through the Trainer: state placed
    sharded, single and scan-chained steps run, snapshot round-trip
    restores into the sharded layout."""

    def _trainer(self, tmp_path):
        from audiodeepfake_detection_tpu.models import DCNN
        from audiodeepfake_detection_tpu.ops.wpt import packet_image
        from audiodeepfake_detection_tpu.train.trainer import Trainer
        from audiodeepfake_detection_tpu.utils.config import default_config

        args = default_config()
        args.update(
            seed=0, learning_rate=4e-4, weight_decay=1e-3,
            fsdp=True, fsdp_min_bytes=0, steps_per_call=2,
        )
        # channel widths divisible by the 8-device mesh so leaves shard
        model = DCNN(
            time_dim=1, ochannels1=8, ochannels2=8, ochannels3=16,
            ochannels4=16, ochannels5=8,
        )

        def transform(audio):
            return packet_image(audio, "haar", level=8, log_scale=True)

        trainer = Trainer(
            model, transform, args, snapshot_path=str(tmp_path / "fsdp")
        )
        batch = {
            "audio": np.random.RandomState(0)
            .randn(16, 1, 2048)
            .astype(np.float32),
            "label": np.tile([0, 1], 8).astype(np.int32),
        }
        trainer.init_state(batch)
        return trainer, batch

    @staticmethod
    def _any_sharded(tree):
        import jax

        return any(
            "data" in str(p.sharding.spec)
            for p in jax.tree_util.tree_leaves(tree)
        )

    def test_state_sharded_and_steps_run(self, tmp_path, eight_devices):
        import jax
        import numpy as np

        from audiodeepfake_detection_tpu.parallel.mesh import shard_batch
        from audiodeepfake_detection_tpu.train.steps import stack_batches

        trainer, batch = self._trainer(tmp_path)
        assert self._any_sharded(trainer.state.params)
        assert self._any_sharded(trainer.state.opt_state)

        db = shard_batch(trainer.mesh, batch)
        state, stats = trainer.train_step(trainer.state, db)
        assert np.isfinite(float(stats["loss"]))
        assert self._any_sharded(state.params)

        group = shard_batch(
            trainer.mesh, stack_batches([batch, batch]), batch_axis=1
        )
        state, mstats = trainer.multi_train_step(state, group)
        assert np.isfinite(np.asarray(mstats["loss"])).all()
        assert mstats["loss"].shape == (2,)
        assert self._any_sharded(state.params)
        trainer.state = state

    def test_snapshot_roundtrip_restores_sharded(self, tmp_path, eight_devices):
        import numpy as np

        from audiodeepfake_detection_tpu.parallel.mesh import shard_batch

        trainer, batch = self._trainer(tmp_path)
        db = shard_batch(trainer.mesh, batch)
        trainer.state, _ = trainer.train_step(trainer.state, db)
        trainer.save_snapshot(epoch=1)

        fresh, _ = self._trainer(tmp_path)
        fresh.load_snapshot()
        assert fresh.epochs_run == 2  # completed count = saved index + 1
        assert self._any_sharded(fresh.state.params)
        assert self._any_sharded(fresh.state.opt_state)
        for a, b in zip(
            np.asarray(trainer.state.step, np.int32).reshape(1),
            np.asarray(fresh.state.step, np.int32).reshape(1),
        ):
            assert a == b
