"""Vectorized multi-seed sweep runner: train S grid seeds in one program.

The reference's grid driver runs each seed as a full independent training
run (reference: src/audiofakedetect/train_classifier.py:1147 loops the
cartesian grid whose first axis is the seed list, utils.py:505-513).  This
runner drives the :mod:`train.vectorized` steps — one jitted program whose
every tensor carries a leading ``[S]`` seed axis — through the standard
epoch / validation / checkpoint cadence, and delegates everything
seed-scalar (metrics, EER tables, ``.pt``/orbax snapshots, tensorboard,
true-index dumps) to S ordinary per-seed :class:`~.trainer.Trainer`
"shadows" by slicing the vectorized state with
:func:`~.vectorized.state_for_seed`.  Slices are device-side gathers, so a
validation pass costs S cheap evals, while the expensive part — training —
runs S× per dispatch.

Parity: each seed sees its own init, PRNG stream, optimizer moments, BN
running stats and data order (per-seed shuffled loaders), so the final
per-seed states equal the serial grid's (locked by tests/test_vectorized.py
at step level and tests/test_sweep.py end-to-end).

Memory: in the default vmap mode activations scale with S (the DCNN's
layer-1 tensor is ~100 MB/seed at batch 128 bf16, ~2x that fp32), so
large-batch fp32-parity sweeps may need a smaller ``batch_size`` or the
bf16 speed mode (``dtype: "bfloat16"``) to fit S seeds in HBM.  Models
with fused Pallas kernels automatically run the seed axis as a
``lax.map`` inside the program instead (``seed_axis="scan"``): fused
speed is kept and activation memory does NOT scale with S.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import numpy as np

from .steps import audio_to_float, stack_batches
from .vectorized import (
    create_vectorized_state,
    make_vectorized_eval_step,
    make_vectorized_multi_train_step,
    make_vectorized_train_step,
    multi_seed_epoch,
    stack_seed_states,
    state_for_seed,
)

__all__ = ["VectorizedSeedSweep"]


class VectorizedSeedSweep:
    """Drive S shadow Trainers through one vectorized training run.

    ``shadows`` are fully-constructed per-seed Trainers (one per seed, same
    model / transform / mesh / hyper-parameters, per-seed ``args.seed`` and
    snapshot paths); ``train_loaders`` are the per-seed shuffled train
    loaders, index-aligned with ``shadows``.
    """

    def __init__(self, shadows: Sequence, train_loaders: Sequence) -> None:
        if len(shadows) != len(train_loaders):
            raise ValueError("one train loader per shadow Trainer required")
        if not shadows:
            raise ValueError("at least one seed required")
        self.shadows = list(shadows)
        self.train_loaders = list(train_loaders)
        lead = self.shadows[0]
        self.model = lead.model
        self.transform = lead.transform
        self.args = lead.args
        self.mesh = lead.mesh
        self.steps_per_call = lead.steps_per_call
        self.seeds = [int(sh.args.seed or 0) for sh in self.shadows]

        # configs may differ in lr / weight decay as well as seed (the
        # driver's --vmap-hparams grouping): per-slice optimizer scalars
        # then live in opt_state.hyperparams (make_hyper_optimizer) so one
        # program trains the whole lr x wd x seed block.  NB such runs'
        # orbax opt_state uses the inject_hyperparams layout; `.pt`
        # weight snapshots are unaffected.
        lrs = [float(sh.args.learning_rate) for sh in self.shadows]
        wds = [float(sh.args.weight_decay) for sh in self.shadows]
        if len(set(lrs)) > 1 or len(set(wds)) > 1:
            from .vectorized import make_hyper_optimizer

            self.tx = make_hyper_optimizer(lrs[0], wds[0])
            self._hyper = {"learning_rate": lrs, "weight_decay": wds}
        else:
            self.tx = lead.tx
            self._hyper = None

        # Seed-axis mode: the fused Pallas kernels dispatch through
        # shard_map, which has no vmap batching rule — for those models the
        # seed axis runs as a lax.map INSIDE the jitted program instead
        # (vectorized.py): same per-seed numerics and dispatch
        # amortization, full fused-kernel speed per seed, and activation
        # memory that does not scale with S.
        self.seed_axis = "vmap"
        for attr in ("fused_layer1", "fused_layer2", "fused_pool"):
            if getattr(self.model, attr, False):
                self.seed_axis = "scan"
                print(
                    f"(vectorized sweep: {attr} active -> seed axis runs "
                    "as lax.map inside the program; fused Pallas kernels "
                    "keep their speed)"
                )
                break
        # the sharded/pipelined runtimes re-layout state in ways the seed
        # axis would break.
        if bool(self.args.get("fsdp")) or int(self.args.get("pp_stages") or 1) > 1:
            raise ValueError(
                "vmap_seeds composes with data parallelism only "
                "(fsdp / pp_stages must be off)"
            )
        if bool(self.args.get("device_data")):
            # the driver's serial fallback honors device_data, so raising
            # here routes the group to a path that actually uses it
            raise ValueError(
                "vmap_seeds streams per-seed batch orders; device_data "
                "(HBM-resident frames) is a serial-trainer feature"
            )

        self._build_steps()
        self.vstate = None
        self.step_total = 0

    def _build_steps(self) -> None:
        aug = dict(
            aug_contrast=bool(self.args.aug_contrast),
            aug_noise=bool(self.args.aug_noise),
            grad_accum=int(self.args.get("grad_accum") or 1),
        )
        self.train_step = make_vectorized_train_step(
            self.model, self.transform, self.tx,
            seed_axis=self.seed_axis, **aug,
        )
        self.multi_train_step = (
            make_vectorized_multi_train_step(
                self.model, self.transform, self.tx,
                seed_axis=self.seed_axis, **aug,
            )
            if self.steps_per_call > 1
            else None
        )
        self._veval = None

    def _guard_fused_zero_alpha(self) -> None:
        """Same safety as Trainer._guard_fused_zero_alpha, on the [S] state:
        the fused kernels cannot propagate dalpha through an exactly-zero
        PReLU slope — rebuild on the unfused XLA path if any seed has one
        (never happens on fresh inits; imports/resumes can)."""
        if self.seed_axis != "scan" or self.vstate is None:
            return
        from jax.tree_util import keystr, tree_flatten_with_path

        leaves, _ = tree_flatten_with_path(self.vstate.params)
        zeros = [
            keystr(path)
            for path, leaf in leaves
            if "alpha" in keystr(path).lower()
            and np.any(np.asarray(leaf) == 0.0)
        ]
        if not zeros:
            return
        print(
            "warning: PReLU slope(s) exactly 0.0 in the vectorized state "
            f"({', '.join(zeros)}); using the unfused XLA path."
        )
        fused = [
            a
            for a in ("fused_layer1", "fused_layer2", "fused_pool")
            if getattr(self.model, a, False)
        ]
        self.model = self.model.clone(**{a: False for a in fused})
        self.seed_axis = "vmap"
        self._build_steps()

    # ------------------------------------------------------------- lifecycle

    def _init_vstate(self, example_batch: Dict[str, np.ndarray]) -> None:
        if self.vstate is not None:
            return
        import jax.numpy as jnp

        from ..parallel.mesh import replicate

        # example batch is [S, B, ...]; any seed's slice probes the shape
        image = self.transform(
            audio_to_float(jnp.asarray(example_batch["audio"][0][:2]))
        )
        self.vstate = create_vectorized_state(
            self.model, self.tx, image, self.seeds,
            hyperparams=self._hyper, seed_axis=self.seed_axis,
        )
        self.vstate = self.vstate._replace(
            params=replicate(self.mesh, self.vstate.params),
            batch_stats=replicate(self.mesh, self.vstate.batch_stats),
            opt_state=replicate(self.mesh, self.vstate.opt_state),
        )
        self._guard_fused_zero_alpha()

    def _push_states(self) -> None:
        """Slice the vectorized state into every shadow Trainer."""
        for i, sh in enumerate(self.shadows):
            sh.state = state_for_seed(self.vstate, i)
            sh.step_total = self.step_total

    def _try_resume(self) -> int:
        """Resume an interrupted sweep from the per-seed snapshots.

        Every shadow restores its own snapshot (orbax full state, or the
        ``.pt`` weights-only fallback — the same ladder as the serial
        Trainer); the slices stack back into the vectorized state.  All
        slices must sit at the same epoch — a partial or mixed set starts
        fresh instead.  Returns the epoch to resume from (0 = fresh).
        """
        import os

        from ..parallel.mesh import replicate

        def has_snapshot(sh):
            return (
                os.path.isdir(sh.orbax_path)
                or os.path.exists(sh.snapshot_path + ".state.pkl")
                or os.path.exists(sh.snapshot_path)
            )

        if not all(has_snapshot(sh) for sh in self.shadows):
            return 0
        if self._hyper is not None:
            # hyper sweeps snapshot the inject_hyperparams opt_state
            # layout; point each shadow's tx at the matching structure
            # (with its own scalars) so the structured restore round-trips
            from .vectorized import make_hyper_optimizer

            for sh in self.shadows:
                sh.tx = make_hyper_optimizer(
                    float(sh.args.learning_rate),
                    float(sh.args.weight_decay),
                )
        try:
            for sh in self.shadows:
                sh.load_snapshot()
            epochs = {sh.epochs_run for sh in self.shadows}
            if len(epochs) != 1:
                print(
                    "(sweep resume skipped: per-seed snapshots at "
                    f"different epochs {sorted(epochs)})"
                )
                return 0
            vstate = stack_seed_states([sh.state for sh in self.shadows])
        except Exception as exc:
            print(f"(sweep resume skipped: {exc})")
            return 0
        self.vstate = vstate._replace(
            params=replicate(self.mesh, vstate.params),
            batch_stats=replicate(self.mesh, vstate.batch_stats),
            opt_state=replicate(self.mesh, vstate.opt_state),
        )
        self.step_total = int(np.asarray(self.vstate.step)[0])
        self._guard_fused_zero_alpha()
        # epochs_run = completed-epoch count (serial Trainer contract):
        # training continues at that index
        start = epochs.pop()
        print(
            f"sweep resume: restored {len(self.shadows)} seed snapshots "
            f"({start} completed epoch(s)); continuing"
        )
        return start

    # -------------------------------------------------------------- training

    def _shard(self, stacked, grouped: bool = False):
        from ..parallel.mesh import shard_batch

        # [S, B, ...] -> batch axis 1; [G, S, B, ...] -> batch axis 2
        return shard_batch(self.mesh, stacked, batch_axis=2 if grouped else 1)

    def _run_epoch(self, epoch: int) -> None:
        print(
            f"+--------------- Epoch {epoch + 1} "
            f"({len(self.seeds)} seeds vectorized) ---------------+",
            flush=True,
        )
        from .profiling import StepTimer

        batches = multi_seed_epoch(self.train_loaders, epoch)
        first = next(iter(batches), None)
        if first is None:
            return
        self._init_vstate(first)

        def chain():
            yield first
            yield from batches

        # frames/s accounting: every step advances S seeds x B frames
        timer = StepTimer(
            self.train_loaders[0].batch_size * len(self.seeds)
        )
        pending: List[tuple] = []
        spc = self.steps_per_call
        buf: List[dict] = []

        def flush_group():
            group = stack_batches(buf)
            buf.clear()
            self.vstate, stats = self.multi_train_step(
                self.vstate, self._shard(group, grouped=True)
            )
            for g in range(spc):
                self.step_total += 1
                timer.step()
                pending.append(
                    (self.step_total, jax.tree.map(lambda s, g=g: s[g], stats))
                )

        for stacked in chain():
            if spc > 1:
                buf.append(stacked)
                if len(buf) == spc:
                    flush_group()
                continue
            self.vstate, stats = self.train_step(
                self.vstate, self._shard(stacked)
            )
            self.step_total += 1
            timer.step()
            pending.append((self.step_total, stats))
        for stacked in buf:  # remainder of a partial group: single steps
            self.vstate, stats = self.train_step(
                self.vstate, self._shard(stacked)
            )
            self.step_total += 1
            timer.step()
            pending.append((self.step_total, stats))

        # one host fetch for the epoch's stats; fan out per seed
        for step_no, stats in pending:
            loss = np.asarray(stats["loss"])
            acc = np.asarray(stats["acc"])
            for i, sh in enumerate(self.shadows):
                sh.loss_list.append([step_no, epoch, float(loss[i])])
                sh.accuracy_list.append([step_no, epoch, float(acc[i])])
                if sh.writer is not None:
                    sh.writer.add_scalar("loss/train", float(loss[i]), step_no)
                    sh.writer.add_scalar(
                        "accuracy/train", float(acc[i]), step_no
                    )
        print(f"epoch {epoch + 1}: {timer.summary()}", flush=True)

    # ------------------------------------------------------------ evaluation

    def _vectorized_eval(self, loader, name: str) -> List[tuple]:
        """ONE pass over ``loader`` evaluates every seed.

        Eval order is deterministic and seed-independent, so batches are
        shared and the vmapped eval step (in_axes ``(0, 0, None)``) scores
        all S parameter sets per dispatch — an S× reduction of eval passes
        vs the serial grid.  Metric finalization reuses the exact Trainer
        path per seed slice (``Trainer._eval_finalize``).  Returns per-seed
        ``(acc, eer)``, index-aligned with ``self.shadows``.
        """
        from ..parallel.mesh import shard_batch

        if self._veval is None:
            self._veval = make_vectorized_eval_step(
                self.model, self.transform, seed_axis=self.seed_axis
            )
        ok = cnt = None
        device_results = []  # per batch: (y, out_max, ok_mask, scores), [S, B]
        host_batches = []
        for batch in loader.epoch(0, shuffle=False):
            db = shard_batch(self.mesh, batch)  # async H2D, shared by seeds
            res = self._veval(
                self.vstate.params, self.vstate.batch_stats, db
            )
            ok = res["ok_per_label"] if ok is None else ok + res["ok_per_label"]
            cnt = (
                res["count_per_label"]
                if cnt is None
                else cnt + res["count_per_label"]
            )
            device_results.append(
                (res["y"], res["out_max"], res["ok_mask"], res["scores"])
            )
            host_batches.append(
                (
                    np.asarray(
                        batch.get("weight", np.ones(len(batch["label"])))
                    ),
                    batch.get("index"),
                )
            )
        if ok is None:
            return [(0.0, 0.0) for _ in self.shadows]
        # fetch stacked results once, then slice per seed on the host
        ok = np.asarray(ok)  # [S, L]
        cnt = np.asarray(cnt)
        fetched = [
            tuple(np.asarray(arr) for arr in res) for res in device_results
        ]
        out = []
        for i, sh in enumerate(self.shadows):
            print(f"--- seed {sh.args.seed} ---")
            per_seed = [
                (y[i], om[i], okm[i], sc[i]) for (y, om, okm, sc) in fetched
            ]
            out.append(
                sh._eval_finalize(name, ok[i], cnt[i], per_seed, host_batches)
            )
        return out

    def _run_validation(self, epoch: int) -> None:
        """Trainer._run_validation, one vectorized pass per loader."""
        known = self._vectorized_eval(self.shadows[0].val_loader, "val known")
        unknown = [(0.0, 0.0)] * len(self.shadows)
        if self.shadows[0].cross_loader_val is not None:
            unknown = self._vectorized_eval(
                self.shadows[0].cross_loader_val, "val unknown"
            )
        for sh, (va, ve), (ca, ce) in zip(self.shadows, known, unknown):
            if sh.writer is not None:
                sh.writer.add_scalar("accuracy/validation", va, self.step_total)
                sh.writer.add_scalar("eer/validation", ve, self.step_total)
                sh.writer.add_scalar(
                    "accuracy/cross_validation", ca, self.step_total
                )
                sh.writer.add_scalar(
                    "eer/cross_validation", ce, self.step_total
                )
                sh.writer.add_scalar("epochs", epoch, self.step_total)

    def _testing(self) -> None:
        """Trainer.testing, one vectorized pass per loader."""
        known = self._vectorized_eval(
            self.shadows[0].test_loader, "test known"
        )
        unknown = [(0.0, 0.0)] * len(self.shadows)
        if self.shadows[0].cross_loader_test is not None:
            unknown = self._vectorized_eval(
                self.shadows[0].cross_loader_test, "test unknown"
            )
        for sh, (ta, te), (ca, ce) in zip(self.shadows, known, unknown):
            sh.test_results = (ta, te, ca, ce)
            if sh.writer is not None:
                sh.writer.add_scalar("accuracy/test", ta, self.step_total)
                sh.writer.add_scalar("eer/test", te, self.step_total)
                sh.writer.add_scalar("accuracy/cross_test", ca, self.step_total)
                sh.writer.add_scalar("eer/cross_test", ce, self.step_total)
            print(
                f"seed {sh.args.seed} test results: "
                f"known acc {ta * 100:2.2f} %, known eer {te:.3f}, "
                f"unknown acc {ca * 100:2.2f} %, unknown eer {ce:.3f}"
            )

    def train(self, max_epochs: int) -> None:
        """Epoch loop with the reference's ckpt/validation cadence
        (reference train_classifier.py:1021-1053), vectorized over seeds;
        checkpoints run through the shadows, validation/testing through
        one vectorized eval pass per loader.  With the ``resume`` config
        flag an interrupted sweep restores the per-seed snapshots and
        continues (same contract as Trainer.train via --resume)."""
        args = self.args
        start_epoch = 0
        if self.vstate is None and bool(args.get("resume")):
            start_epoch = self._try_resume()
        for epoch in range(start_epoch, max_epochs):
            self._run_epoch(epoch)
            self._push_states()
            if (
                (epoch > 0 and epoch % args.ckpt_every == 0)
                or (epoch == 0 and args.ckpt_every == 1)
                or (epoch == max_epochs - 1)
            ):
                for sh in self.shadows:
                    sh.save_snapshot(epoch)
            if (epoch > 0 and epoch % args.validation_interval == 0) or (
                epoch == 0 and args.validation_interval == 1
            ):
                self._run_validation(epoch)
            if epoch == max_epochs - 1:
                print("Training done, now testing...")
                self._testing()
