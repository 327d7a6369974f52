"""Experiment driver: config -> grid -> transforms -> model -> Trainer.

TPU-native equivalent of the reference's ``main``
(src/audiofakedetect/train_classifier.py:1084-1368): grid search over a
dict-of-lists config with a seed axis, per-experiment seeding, transform +
normalization construction, model factory, five data loaders
(train/val/test/cross-val/cross-test), Trainer with
``only_testing`` / ``only_ig`` / train modes, per-seed result accumulation,
true-index dumps, and LaTeX result emission.

Run as ``python -m audiodeepfake_detection_tpu.train.experiment [flags]``;
flag names match the reference CLI.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict

import numpy as np

from ..data.dataset import get_custom_dataset
from ..data.loader import FrameLoader
from ..models.factory import get_model
from ..parallel.mesh import get_mesh
from ..utils.config import (
    DotDict,
    build_new_grid,
    default_config,
    load_grid_config,
)
from ..utils.naming import experiment_model_file, tensorboard_dir
from .results import print_results
from .trainer import Trainer
from .transforms import get_transforms, normalized_transform


def add_default_parser_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """CLI flags with the reference's names/defaults (utils.py:30-317)."""
    d = default_config()
    parser.add_argument("--log-dir", type=str, default=d.log_dir)
    parser.add_argument("--batch-size", type=int, default=d.batch_size)
    parser.add_argument("--learning-rate", type=float, default=d.learning_rate)
    parser.add_argument("--weight-decay", type=float, default=d.weight_decay)
    parser.add_argument("--epochs", type=int, default=d.epochs)
    parser.add_argument("--transform", choices=["stft", "packets"], default=d.transform)
    parser.add_argument(
        "--features",
        choices=["lfcc", "delta", "doubledelta", "none"],
        default=d.features,
    )
    parser.add_argument("--num-of-scales", type=int, default=d.num_of_scales)
    parser.add_argument("--wavelet", type=str, default=d.wavelet)
    parser.add_argument("--sample-rate", type=int, default=d.sample_rate)
    parser.add_argument("--window-size", type=int, default=d.window_size)
    parser.add_argument("--f-min", type=float, default=d.f_min)
    parser.add_argument("--f-max", type=float, default=d.f_max)
    parser.add_argument("--hop-length", type=int, default=d.hop_length)
    parser.add_argument("--log-scale", action="store_true")
    parser.add_argument("--block-norm", action="store_true")
    parser.add_argument("--power", type=float, default=d.power)
    parser.add_argument("--dropout-cnn", type=float, default=d.dropout_cnn)
    parser.add_argument("--dropout-lstm", type=float, default=d.dropout_lstm)
    parser.add_argument("--loss-less", choices=["True", "False"], default=d.loss_less)
    parser.add_argument("--random-seeds", action="store_true")
    parser.add_argument("--aug-contrast", action="store_true")
    parser.add_argument("--aug-noise", action="store_true")
    parser.add_argument("--calc-normalization", action="store_true")
    parser.add_argument("--mean", type=float, nargs="+", default=d.mean)
    parser.add_argument("--std", type=float, nargs="+", default=d.std)
    parser.add_argument("--data-prefix", type=str, default=d.data_prefix)
    parser.add_argument("--unknown-prefix", type=str, default=None)
    parser.add_argument(
        "--cross-sources", type=str, nargs="+", default=d.cross_sources
    )
    parser.add_argument("--init-seeds", type=int, nargs="+", default=d.init_seeds)
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--flattend-size", type=int, default=d.flattend_size)
    parser.add_argument(
        "--model", choices=["lcnn", "gridmodel", "modules"], default=d.model
    )
    parser.add_argument("--nclasses", type=int, default=d.nclasses)
    parser.add_argument("--enable-gs", action="store_true")
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--pbar", action="store_true")
    parser.add_argument(
        "--validation-interval", type=int, default=d.validation_interval
    )
    # NB reference uses type=bool here (utils.py), which parses any
    # non-empty string as True — a footgun, not parity worth keeping.
    parser.add_argument("--only-testing", action="store_true")
    parser.add_argument("--ckpt-every", type=int, default=d.ckpt_every)
    parser.add_argument("--time-dim-add", type=int, default=d.time_dim_add)
    parser.add_argument("--ddp", action="store_true")  # accepted; mesh is automatic
    parser.add_argument("--frame-cache", action="store_true")
    parser.add_argument("--steps-per-call", type=int, default=d.steps_per_call)
    # park the whole training frame set in HBM once; each dispatch then
    # ships only [G, B] int32 indices (train/device_data.py).  The lever
    # when per-dispatch H2D latency bounds e2e training throughput.
    parser.add_argument("--device-data", action="store_true")
    # gradient accumulation: scan the train step over N microbatches of
    # batch_size/N — full-batch mean gradient, 1/N activation memory
    # (train/steps.py _train_step_body; BatchNorm models normalize with
    # per-microbatch moments, like torch grad accumulation).
    parser.add_argument("--grad-accum", type=int, default=d.grad_accum)
    # store both Adam moments in this dtype (train/steps.py
    # scale_by_adam_lowp): "bfloat16" halves optimizer-state HBM and its
    # per-step read+write traffic; default fp32 keeps exact torch-Adam
    # trajectory parity.
    parser.add_argument(
        "--adam-moments-dtype",
        choices=["float32", "bfloat16"],
        default=d.adam_moments_dtype,
    )
    # ZeRO-3-style param/optimizer sharding over the data axis
    # (parallel/fsdp.py); only pays off for large models (AST).
    parser.add_argument("--fsdp", action="store_true")
    parser.add_argument(
        "--fsdp-min-bytes", type=int, default=d.fsdp_min_bytes
    )
    # GPipe pipeline over the AST encoder (parallel/pipeline.py): the mesh
    # gets a 'stage' axis of this size; remaining devices do DP.
    parser.add_argument("--pp-stages", type=int, default=d.pp_stages)
    parser.add_argument(
        "--pp-microbatches", type=int, default=d.pp_microbatches
    )
    # grid-vectorized sweeps (train/vectorized.py): all seeds of each grid
    # config trained in ONE jitted program (vmap over the seed axis);
    # --vmap-hparams additionally folds the learning-rate/weight-decay grid
    # axes into the same program (per-slice optimizer hyperparams).
    parser.add_argument("--vmap-seeds", action="store_true")
    parser.add_argument("--vmap-hparams", action="store_true")
    # resume training from an existing snapshot at the experiment's own
    # path (full orbax state when present, .pt weights otherwise).  The
    # reference saves EPOCHS_RUN but can never continue a run
    # (train_classifier.py:1028); off by default so re-running an
    # experiment retrains from scratch like the reference.
    parser.add_argument("--resume", action="store_true")
    # speed mode: bf16 activations + Pallas fused first-layer kernels
    # (fp32 + XLA remain the parity defaults; see docs/benchmarks.md).
    # Tri-state: off / train (kernel for training only) / always (eval
    # too — parity tests); default None = whatever the config file says.
    parser.add_argument(
        "--dtype", choices=["float32", "bfloat16"], default=d.dtype
    )
    parser.add_argument(
        "--fused-layer1", choices=["off", "train", "always"], default=None
    )
    parser.add_argument(
        "--fused-pool", choices=["off", "train", "always"], default=None
    )
    parser.add_argument("--only-ig", action="store_true")
    parser.add_argument("--config", type=str, default=None)
    return parser


def maybe_initialize_distributed() -> tuple:
    """Multi-host init: the torchrun/c10d-rendezvous replacement.

    On a multi-host TPU slice ``jax.distributed.initialize()`` picks the
    coordinator from the TPU metadata (reference launches one process per
    GPU via torchrun, train_classifier.py:44-47 + scripts/train.sh:35-38;
    here it is one process per host and the mesh covers the slice).
    Returns (process_index, process_count) for loader sharding.
    """
    import jax

    should_init = (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or int(os.environ.get("TPU_PROCESS_COUNT", "1") or 1) > 1
    )
    if should_init:
        try:
            jax.distributed.initialize()
        except Exception as exc:  # already initialized / single host
            print(f"(jax.distributed.initialize skipped: {exc})")
    return jax.process_index(), jax.process_count()


def get_input_dims(args: DotDict, transform) -> list:
    """Probe the transform output shape (reference utils.py:589-621)."""
    t = int(args.seconds * args.sample_rate)
    probe = np.zeros((1, 1, t), dtype=np.float32)
    shape = list(np.asarray(transform(probe)).shape)
    shape[0] = args.batch_size
    return shape


def loader_shard_kw(args: DotDict) -> dict:
    """Per-process feeding policy — the SINGLE source for every loader
    builder (serial and vectorized paths must feed identically, or the
    sweep's data-order parity with the serial grid silently breaks)."""
    import jax

    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        # True builds the pre-decoded frame cache up front; None only
        # uses one that already exists (data/frame_cache.py).  With the
        # cache on, batches ship as raw int16 PCM (on-device conversion).
        use_frame_cache=True if args.frame_cache else None,
        emit="int16" if args.frame_cache else "float32",
    )


def norm_batches_fn(train_loader):
    """Welford-statistics batch stream over the train set.

    The reference computes stats at batch 4000 over the train set
    (wavelet_math.py:419-426); capped at the dataset size so small sets
    don't process padding.
    """

    def norm_batches():
        bs = max(1, min(4000, len(train_loader.dataset)))
        big = FrameLoader(train_loader.dataset, bs)
        for batch in big.epoch(0, shuffle=False):
            keep = batch["weight"] > 0
            yield batch["audio"][keep]

    return norm_batches


def create_data_loaders(args: DotDict):
    """Five loaders: train/val/test + cross val/test
    (reference train_classifier.py:50-229)."""

    def make(ds_type, limit, asv_suffix, data_path, only_use, only_test_folders=None,
             include_index=False):
        asv = args.asvspoof_name
        if asv is not None and "LA" in str(asv):
            asv = f"{asv}_{asv_suffix}"
        ds = get_custom_dataset(
            data_path=data_path,
            ds_type=ds_type,
            only_use=only_use,
            only_test_folders=only_test_folders,
            save_path=args.save_path,
            limit=limit,
            asvspoof_name=asv,
            file_type=args.file_type,
            resample_rate=args.sample_rate,
            seconds=args.seconds,
        )
        return ds

    train_ds = make("train", args.limit_train[0], "T", args.data_path, args.only_use)
    val_ds = make("val", args.limit_train[1], "D", args.data_path, args.only_use)
    test_ds = make("test", args.limit_train[2], "E", args.data_path, args.only_use)

    shard_kw = loader_shard_kw(args)
    train_loader = FrameLoader(
        train_ds,
        args.batch_size,
        shuffle=True,
        drop_last=True,
        seed=int(args.seed or 0),
        **shard_kw,
    )
    val_loader = FrameLoader(val_ds, args.batch_size, **shard_kw)
    test_loader = FrameLoader(
        test_ds, args.batch_size, include_index=bool(args.get_details), **shard_kw
    )

    cross_loader_val = cross_loader_test = None
    if args.cross_data_path is not None:
        cross_test_ds = get_custom_dataset(
            data_path=args.cross_data_path,
            ds_type="test",
            only_test_folders=args.only_test_folders,
            only_use=args.cross_sources,
            save_path=args.save_path,
            limit=args.cross_limit[2],
            asvspoof_name=args.asvspoof_name_cross,
            file_type=args.file_type,
            resample_rate=args.sample_rate,
            seconds=args.seconds,
        )
        cross_val_ds = get_custom_dataset(
            data_path=args.cross_data_path,
            ds_type="val",
            only_test_folders=args.only_test_folders,
            only_use=args.cross_sources,
            save_path=args.save_path,
            limit=args.cross_limit[1],
            asvspoof_name=args.asvspoof_name_cross,
            file_type=args.file_type,
            resample_rate=args.sample_rate,
            seconds=args.seconds,
        )
        cross_loader_val = FrameLoader(cross_val_ds, args.batch_size, **shard_kw)
        cross_loader_test = FrameLoader(
            cross_test_ds,
            args.batch_size,
            include_index=bool(args.get_details),
            **shard_kw,
        )
    return train_loader, val_loader, test_loader, cross_loader_val, cross_loader_test


def mesh_for(args: DotDict):
    """The experiment's device mesh: 1-D DP, or ('data','stage') for PP.

    ``pp_stages>1`` (GPipe over the AST encoder, parallel/pipeline.py) puts
    the trailing ``stage`` axis on the mesh; the remaining devices do DP.
    """
    pp = int(args.get("pp_stages") or 1)
    if pp > 1:
        from ..parallel.mesh import data_stage_mesh

        return data_stage_mesh(pp)
    return get_mesh()


def run_experiment(args: DotDict, mesh=None, writer=None) -> Trainer:
    """One grid point: transforms, model, loaders, Trainer, chosen mode."""
    if mesh is None and int(args.get("pp_stages") or 1) > 1:
        mesh = mesh_for(args)
    if args.features != "none" and args.model != "lcnn":
        raise NotImplementedError(
            f"LFCC features are currently not implemented for {args.model}."
        )
    if args.only_ig and args.get("fused_layer1"):
        # integrated gradients differentiate the LOSS W.R.T. THE INPUT
        # IMAGE; the fused FIRST-LAYER kernels' compact VJPs return zero
        # input cotangents by design (the transform in front is
        # stop-gradient during training), which would make every
        # attribution map silently zero — force the unfused path.
        # (fused_pool is fine: its mask VJP produces the full dx.)
        print(
            "only_ig: disabling fused_layer1 (its compact VJP carries no "
            "input gradient; attributions need the unfused first layer)."
        )
        args = args.copy()
        args.fused_layer1 = False
    loss_less = args.loss_less == "True"
    if args.transform == "stft" and loss_less:
        raise ValueError(
            "Sign channel not possible for stft due to complex data type."
        )

    np.random.seed(int(args.seed or 0))

    (
        train_loader,
        val_loader,
        test_loader,
        cross_loader_val,
        cross_loader_test,
    ) = create_data_loaders(args)

    transform, mean, std = get_transforms(
        args, train_batches=norm_batches_fn(train_loader)
    )
    args.input_dim = get_input_dims(args, transform)
    full_transform = normalized_transform(transform, mean, std)

    # the mesh threads into the model so the fused Pallas kernels run per
    # batch shard via shard_map (ops/fused_conv1.batch_shard_mapped)
    # instead of being replicated by GSPMD's unknown-custom-call handling
    model = get_model(
        args,
        args.model,
        nclasses=int(args.nclasses or 2),
        in_channels=2 if loss_less else 1,
        mesh=mesh,
    )
    model_name = model.get_name() if args.model == "modules" else "customModel"

    base_dir = args.log_dir
    os.makedirs(base_dir + "/models", exist_ok=True)
    model_file = experiment_model_file(args, base_dir, model_name)

    if args.tensorboard and writer is None:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(tensorboard_dir(args, base_dir, model_name))

    trainer = Trainer(
        model=model,
        transform=full_transform,
        args=args,
        snapshot_path=model_file,
        train_loader=train_loader,
        val_loader=val_loader,
        test_loader=test_loader,
        cross_loader_val=cross_loader_val,
        cross_loader_test=cross_loader_test,
        writer=writer,
        mesh=mesh,
        label_names=test_loader.dataset.label_names,
        norm_stats=None if args.block_norm else (mean, std),
    )

    if args.only_testing:
        trainer.load_snapshot()
        trainer.test_results = trainer.testing(only_unknown=True)
    elif args.only_ig:
        from ..analysis.integrated_gradients import run_integrated_gradients

        trainer.load_snapshot()
        path = f"{args.transform}_{args.sample_rate}_{args.seconds}"
        path += (
            f"_{args.seed}_{args.only_use[-1]}_{args.wavelet}_{args.power}"
            f"_{str(loss_less)}"
        )
        run_integrated_gradients(trainer, path)
    else:
        if args.get("resume") and (
            os.path.isdir(trainer.orbax_path)
            or os.path.exists(trainer.snapshot_path + ".state.pkl")
            or os.path.exists(trainer.snapshot_path)
        ):
            trainer.load_snapshot()
            print(
                f"--resume: restored snapshot, continuing from epoch "
                f"{trainer.epochs_run + 1}"
            )
        trainer.train(args.epochs)
    return trainer


def run_experiment_vectorized(args_list, mesh=None):
    """One grid config × S seeds, trained in ONE vectorized program.

    ``args_list`` holds grid points that differ only in ``seed`` (and,
    with ``--vmap-hparams``, ``learning_rate``/``weight_decay`` — folded
    in as per-slice optimizer hyperparams).  Setup that is
    slice-independent (datasets, normalization statistics, transform,
    model definition) happens once;
    per-seed shadow Trainers handle snapshots / metrics / tensorboard and
    the :class:`~.sweep.VectorizedSeedSweep` drives training with every
    tensor carrying a leading seed axis (see train/vectorized.py).  The
    reference runs these serially (train_classifier.py:1147).
    """
    from .sweep import VectorizedSeedSweep

    base = args_list[0].copy()
    if base.features != "none" and base.model != "lcnn":
        raise NotImplementedError(
            f"LFCC features are currently not implemented for {base.model}."
        )
    loss_less = base.loss_less == "True"
    if base.transform == "stft" and loss_less:
        raise ValueError(
            "Sign channel not possible for stft due to complex data type."
        )
    np.random.seed(int(base.seed or 0))

    (
        train_loader,
        val_loader,
        test_loader,
        cross_loader_val,
        cross_loader_test,
    ) = create_data_loaders(base)

    transform, mean, std = get_transforms(
        base, train_batches=norm_batches_fn(train_loader)
    )
    base.input_dim = get_input_dims(base, transform)
    full_transform = normalized_transform(transform, mean, std)

    model = get_model(
        base,
        base.model,
        nclasses=int(base.nclasses or 2),
        in_channels=2 if loss_less else 1,
        mesh=mesh,
    )
    model_name = model.get_name() if base.model == "modules" else "customModel"

    base_dir = base.log_dir
    os.makedirs(base_dir + "/models", exist_ok=True)

    shard_kw = loader_shard_kw(base)
    shadows, train_loaders = [], []
    for a in args_list:
        a = a.copy()
        a.input_dim = base.input_dim
        model_file = experiment_model_file(a, base_dir, model_name)
        writer = None
        if a.tensorboard:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(tensorboard_dir(a, base_dir, model_name))
        shadows.append(
            Trainer(
                model=model,
                transform=full_transform,
                args=a,
                snapshot_path=model_file,
                train_loader=train_loader,
                val_loader=val_loader,
                test_loader=test_loader,
                cross_loader_val=cross_loader_val,
                cross_loader_test=cross_loader_test,
                writer=writer,
                mesh=mesh,
                label_names=test_loader.dataset.label_names,
                norm_stats=None if base.block_norm else (mean, std),
            )
        )
        train_loaders.append(
            FrameLoader(
                train_loader.dataset,
                a.batch_size,
                shuffle=True,
                drop_last=True,
                seed=int(a.seed or 0),
                **shard_kw,
            )
        )
    slices = [
        (int(a.seed or 0), float(a.learning_rate), float(a.weight_decay))
        for a in args_list
    ]
    print(
        "vmap_seeds: training (seed, lr, wd) slices "
        f"{slices} in one vectorized program"
    )
    VectorizedSeedSweep(shadows, train_loaders).train(base.epochs)
    return shadows


def dump_true_indices(args: DotDict, trainer, model_file: str) -> str:
    """Write the ``--get-details`` correct-index dump for model-diff analysis.

    "dataset" keeps the reference layout for analyze-model-diffs
    compatibility (reference train_classifier.py:1348-1356): the cross-test
    table, which the "unknown" indices index.  The reference stores the
    "known" indices against that same table even though they index the known
    test set — misaligned rows; the correct table additionally goes under
    "dataset_known" (consumed by analysis/model_diffs.py).  Without a cross
    set the cross table is simply absent instead of crashing.
    """
    known = trainer.current_true_indices.get("test known", np.zeros(0))
    unknown = trainer.current_true_indices.get("test unknown", np.zeros(0))
    payload = {"known": np.asarray(known), "unknown": np.asarray(unknown)}
    if trainer.cross_loader_test is not None:
        payload["dataset"] = trainer.cross_loader_test.dataset.audio_data
    if trainer.test_loader is not None:
        payload["dataset_known"] = trainer.test_loader.dataset.audio_data
    out = f"{args.log_dir}/true_ind_{model_file.split('/')[-1]}_{args.seed}.npy"
    np.save(out, payload)
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Train an audio classifier")
    parser = add_default_parser_args(parser)
    parsed = parser.parse_args(argv)
    args = default_config()
    flags = dict(vars(parsed))
    # tri-state CLI flags: None = keep the config value
    tri = {"off": False, "train": True, "always": "always"}
    for key in ("fused_layer1", "fused_pool"):
        if flags.get(key) is None:
            flags.pop(key, None)
        else:
            flags[key] = tri[flags[key]]
    args.update(flags)

    maybe_initialize_distributed()

    base_dir = args.log_dir
    for sub in ("models", "tensorboard", "norms"):
        os.makedirs(f"{base_dir}/{sub}", exist_ok=True)

    griderator = None
    num_exp = 1
    if args.enable_gs:
        print("--------------- Starting grid search -----------------")
        if not args.config:
            raise RuntimeError("Config file must be provided.")
        config = load_grid_config(args.config)
        griderator = build_new_grid(
            config, random_seeds=args.random_seeds, seeds=args.init_seeds
        )
        num_exp = griderator.get_len()

    exp_results: Dict[Any, list] = {}
    model_file = "defaultmodel"

    if (
        (args.get("vmap_seeds") or args.get("vmap_hparams"))
        and griderator is not None
        and not (args.only_testing or args.only_ig)
    ):
        # materialize every grid point, then group by the non-vectorized
        # config axes: each group trains in ONE vectorized program.
        # --vmap-hparams also folds the lr/wd grid axes into the program
        # (per-slice optimizer hyperparams, train/vectorized.py).  Groups
        # are processed in first-appearance order, so each seed's result
        # list keeps the serial loop's per-seed config order.
        vec_axes = {"seed"}
        if args.get("vmap_hparams"):
            vec_axes |= {"learning_rate", "weight_decay"}
        configs = []
        for _exp in range(num_exp):
            args, _ = griderator.update_step(args)
            configs.append(args.copy())
        groups: Dict[str, list] = {}
        for a in configs:
            key = repr(
                sorted(
                    (k, repr(v)) for k, v in a.items() if k not in vec_axes
                )
            )
            groups.setdefault(key, []).append(a)
        for group in groups.values():
            try:
                shadows = run_experiment_vectorized(
                    group, mesh=mesh_for(group[0])
                )
            except ValueError as exc:
                # a group can be legitimately non-vectorizable (fused
                # Pallas kernels, fsdp/pp configs — VectorizedSeedSweep
                # guards); don't abort the whole sweep and lose the
                # already-trained groups' results — run it serially
                print(
                    f"vmap_seeds: group not vectorizable ({exc}); "
                    "running its configs serially"
                )
                shadows = [run_experiment(a, mesh=mesh_for(a)) for a in group]
            for sh in shadows:
                model_file = sh.snapshot_path[: -len(".pt")]
                exp_results.setdefault(sh.args.seed, []).append(
                    sh.test_results
                )
                if sh.args.get_details and sh.current_true_indices:
                    dump_true_indices(sh.args, sh, model_file)
        print_results(configs[-1], exp_results, griderator, model_file)
        return

    if args.get("vmap_seeds") or args.get("vmap_hparams"):
        print(
            "vmap_seeds: nothing to vectorize "
            "(needs --enable-gs training mode); running serially."
        )

    for _exp in range(num_exp):
        if griderator is not None:
            print("---------------------------------------------------------")
            print(
                "starting new experiments with "
                f"{griderator.grid_values[griderator.current]}"
            )
            print("---------------------------------------------------------")
            args, _ = griderator.update_step(args)
        # per grid point: pp_stages can be a grid axis, and the mesh
        # shape follows it (mesh construction is cheap; jit caches key
        # on the mesh so unchanged configs still hit the cache)
        trainer = run_experiment(args, mesh=mesh_for(args))
        model_file = trainer.snapshot_path[: -len(".pt")]
        exp_results.setdefault(args.seed, []).append(trainer.test_results)

        if args.get_details and trainer.current_true_indices:
            dump_true_indices(args, trainer, model_file)

    print_results(args, exp_results, griderator, model_file)


if __name__ == "__main__":
    main()
