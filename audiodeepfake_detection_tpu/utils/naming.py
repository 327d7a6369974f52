"""Experiment / checkpoint naming, compatible with the reference scheme.

The reference encodes the full experiment configuration into the snapshot
filename, which acts as its checkpoint registry (reference:
src/audiofakedetect/train_classifier.py:1221-1269); the bundled checkpoints
decode with exactly this scheme.  The tensorboard log-dir hierarchy mirrors
train_classifier.py:1271-1291.
"""

from __future__ import annotations

from .config import DotDict


def experiment_model_file(args: DotDict, base_dir: str, model_name: str) -> str:
    """Build the snapshot path prefix (without the ``.pt`` suffix)."""
    path_name = args.data_prefix.split("/")[-1].split("_")
    loss_less = False if args.loss_less == "False" else True

    model_file = base_dir + "/models/" + path_name[0] + "_"
    if args.transform == "stft":
        model_file += "stft"
    elif args.transform == "packets":
        model_file += "packets" + str(args.wavelet)
    model_file += (
        "_"
        + str(args.features)
        + "_"
        + str(args.hop_length)
        + "_"
        + str(args.sample_rate)
        + "_"
        + str(args.window_size)
        + "_"
        + str(args.num_of_scales)
        + "_"
        + str(int(args.f_min))
        + "-"
        + str(int(args.f_max))
        + "_"
        + path_name[3]
        + "_"
        + str(args.learning_rate)
        + "_"
        + str(args.weight_decay)
        + "_"
        + str(args.batch_size)
        + "_"
        + str(args.nclasses)
        + "_"
        + f"{args.epochs}e"
        + "_"
        + str(model_name)
        + "_signs"
        + str(loss_less)
        + "_augc"
        + str(args.aug_contrast)
        + "_augn"
        + str(args.aug_noise)
        + "_power"
        + str(args.power)
        + "_"
        + str(args.only_use[1])
        + "_"
        + str(args.seconds)
        + "secs_"
        + str(args.seed)
    )
    return model_file


def norm_cache_prefix(args: DotDict) -> str:
    """Normalization-stats cache path prefix (reference wavelet_math.py:327-347)."""
    loss_less = "_loss_less" if args.loss_less == "True" else ""
    return (
        args.log_dir
        + "/norms/"
        + args.data_path.replace("/", "_")
        + "_"
        + "-".join(args.only_use)
        + "_"
        + args.transform
        + "_"
        + args.wavelet
        + "_"
        + str(args.num_of_scales)
        + "_"
        + str(args.power)
        + loss_less
        + "_"
        + str(args.sample_rate)
        + "_"
        + str(args.seconds)
        + "secs"
    )


def tensorboard_dir(args: DotDict, base_dir: str, model_name: str) -> str:
    loss_less = False if args.loss_less == "False" else True
    known_gen_name = args.data_prefix.split("/")[-1].split("_")[4]
    parts = [
        base_dir + "/tensorboard",
        model_name,
        str(args.transform),
    ]
    if args.transform == "packets":
        parts.append(str(args.wavelet))
    parts += [
        str(args.features),
        f"{args.batch_size}_{args.learning_rate}_{args.weight_decay}_{args.epochs}",
        f"{args.f_min}-{args.f_max}",
        str(args.num_of_scales),
        f"signs{loss_less}",
        f"augc{args.aug_contrast}",
        f"augn{args.aug_noise}",
        f"power{args.power}",
        known_gen_name,
        str(args.seed),
    ]
    return "/".join(parts)
