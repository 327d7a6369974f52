"""Gradient accumulation (train/steps.py _train_step_body grad_accum).

Beyond-reference trainer capability (the reference trains full batches
only, src/audiofakedetect/train_classifier.py:945-995): the step scans
over N microbatches so activation memory scales with batch/N while the
optimizer consumes the full-batch mean gradient.  Contracts:

* LayerNorm models (AST): grad_accum=N equals the unaccumulated step to
  fp32 summation roundoff;
* BatchNorm models: runs, running stats advance (per-microbatch moments,
  same semantics as torch gradient accumulation — documented);
* trainer-level validation (divisibility, PP exclusivity).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audiodeepfake_detection_tpu.models.ast import ASTModel  # noqa: E402
from audiodeepfake_detection_tpu.models.lcnn import LCNN  # noqa: E402
from audiodeepfake_detection_tpu.train.steps import (  # noqa: E402
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _batch(rng, b, f, t):
    return {
        "audio": jnp.asarray(rng.randn(b, 1, f, t).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 2, b).astype(np.int32)),
    }


IDENT = lambda a: a  # noqa: E731 — batch ships images directly


class TestGradAccum:
    def test_ast_matches_full_batch_step(self):
        """Gradient-mean parity, read through an SGD step.

        SGD is linear in the gradient, so the post-step parameter delta IS
        lr times the gradient — microbatch-summation roundoff shows up at
        its true fp32 scale.  (Under Adam the first-step update is
        ~sign(grad)*lr, which amplifies near-zero-gradient roundoff to a
        full lr-sized flip — that's Adam's conditioning, not an
        accumulation bug, so Adam is checked on loss/acc only below.)
        """
        import optax

        model = ASTModel(model_size="tiny224", input_fdim=64, input_tdim=32)
        rng = np.random.RandomState(0)
        batch = _batch(rng, 8, 64, 32)
        tx = optax.sgd(0.1)
        state0 = create_train_state(model, tx, batch["audio"], seed=0)

        step_full = make_train_step(model, IDENT, tx)
        step_acc = make_train_step(model, IDENT, tx, grad_accum=4)

        s_full, stats_full = step_full(state0, batch)
        state0b = create_train_state(model, tx, batch["audio"], seed=0)
        s_acc, stats_acc = step_acc(state0b, batch)

        assert abs(float(stats_full["loss"]) - float(stats_acc["loss"])) < 1e-6
        assert float(stats_full["acc"]) == pytest.approx(
            float(stats_acc["acc"]), abs=1e-6
        )
        for a, b in zip(
            jax.tree.leaves(s_full.params), jax.tree.leaves(s_acc.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=0
            )

    def test_ast_adam_loss_acc_match(self):
        model = ASTModel(model_size="tiny224", input_fdim=64, input_tdim=32)
        rng = np.random.RandomState(4)
        batch = _batch(rng, 8, 64, 32)
        tx = make_optimizer(4e-4, 1e-3)
        state0 = create_train_state(model, tx, batch["audio"], seed=0)
        _, stats_full = make_train_step(model, IDENT, tx)(state0, batch)
        state0b = create_train_state(model, tx, batch["audio"], seed=0)
        _, stats_acc = make_train_step(model, IDENT, tx, grad_accum=2)(
            state0b, batch
        )
        assert abs(float(stats_full["loss"]) - float(stats_acc["loss"])) < 1e-6
        assert float(stats_full["acc"]) == pytest.approx(
            float(stats_acc["acc"]), abs=1e-6
        )

    def test_bn_model_runs_and_stats_advance(self):
        model = LCNN(lstm_channels=32, dropout=0.0)
        rng = np.random.RandomState(1)
        batch = _batch(rng, 8, 32, 20)
        tx = make_optimizer(4e-4, 1e-3)
        state0 = create_train_state(model, tx, batch["audio"], seed=0)
        step = make_train_step(model, IDENT, tx, grad_accum=2)
        s1, stats = step(state0, batch)
        assert np.isfinite(float(stats["loss"]))
        # running BN stats advanced (twice, per-microbatch — documented)
        before = jax.tree.leaves(
            create_train_state(model, tx, batch["audio"], seed=0).batch_stats
        )
        after = jax.tree.leaves(s1.batch_stats)
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )

    def test_indivisible_batch_raises(self):
        model = ASTModel(model_size="tiny224", input_fdim=64, input_tdim=32)
        rng = np.random.RandomState(2)
        batch = _batch(rng, 6, 64, 32)
        tx = make_optimizer(4e-4, 1e-3)
        state0 = create_train_state(model, tx, batch["audio"], seed=0)
        step = make_train_step(model, IDENT, tx, grad_accum=4)
        with pytest.raises(ValueError, match="not divisible"):
            step(state0, batch)

    def test_trainer_rejects_pp_combination(self):
        from audiodeepfake_detection_tpu.train.trainer import Trainer
        from audiodeepfake_detection_tpu.utils.config import default_config

        args = default_config()
        args.update(grad_accum=2, pp_stages=2, batch_size=8)
        model = ASTModel(model_size="tiny224", input_fdim=64, input_tdim=32)
        with pytest.raises(ValueError, match="mutually exclusive"):
            Trainer(
                model=model,
                transform=IDENT,
                args=args,
                snapshot_path="/tmp/ga_pp_test",
            )
