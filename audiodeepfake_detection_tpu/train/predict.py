"""Batched inference: score audio clips with a trained model.

A serving-oriented addition (the reference only exposes ``only_testing``
over datasets): one jitted scoring function ``audio -> P(fake)`` plus a
file-level convenience that handles decode, framing, resampling and
aggregation over frames.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_score_fn(
    model, transform: Callable, variables, output: str = "prob",
    closed: bool = False, chunk: int = 0,
) -> Callable:
    """Jitted ``[B, 1, T] audio -> [B]`` scorer.

    ``output``: ``"prob"`` = ``P(fake)`` (softmax); ``"margin"`` = the raw
    fake-real logit margin — monotone in ``P(fake)`` but unsaturated, so
    rank comparisons stay meaningful when approximate normalization
    pushes the softmax to 0/1.

    ``closed=False`` (default, the serving path): variables are
    device_put once and passed as a jit ARGUMENT — a closed-over weight
    tree becomes HLO constants, and an 86M-param model makes a ~346 MB
    program that exceeds the TPU relay's compile-request limit (observed
    HTTP 413).  ``closed=True`` embeds the weights as constants — what
    the StableHLO export (train/export.py) needs, since the artifact
    must carry them.

    ``chunk``: scan the forward over microbatches of that size inside
    the single dispatch (applies when it divides the batch).  Large AST
    batches lose VMEM residency — the serving analogue of the train-side
    grad-accum fix: measured on v5e, base384 int8-baked b512 runs at
    2,214 frames/s whole-batch vs 2,338 with ``chunk=128``
    (docs/benchmarks.md "AST serving batch knee").  DCNN/LCNN stay
    whole-batch (no knee); 0 disables.
    """

    from .steps import audio_to_float

    def fwd(v, image: jnp.ndarray) -> jnp.ndarray:
        return model.apply(v, image, train=False)

    def compute(v, audio: jnp.ndarray) -> jnp.ndarray:
        # int16 PCM batches convert in-graph (halved H2D bytes; XLA fuses
        # the scale into the transform's first op) — see serve.py pcm16
        image = transform(audio_to_float(audio))
        b = image.shape[0]
        if chunk and chunk < b and b % chunk == 0:
            groups = image.reshape((b // chunk, chunk) + image.shape[1:])
            logits = jax.lax.map(lambda g: fwd(v, g), groups)
            logits = logits.reshape((b,) + logits.shape[2:])
        else:
            logits = fwd(v, image)
        if output == "margin":
            return logits[:, 1] - logits[:, 0]
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    if closed:
        return jax.jit(lambda audio: compute(variables, audio))
    scorer = jax.jit(compute)
    dvars = jax.device_put(variables)

    def score(audio: jnp.ndarray) -> jnp.ndarray:
        return scorer(dvars, audio)

    return score


def score_files(
    model,
    transform: Callable,
    variables,
    paths: Sequence[str],
    sample_rate: int = 22050,
    seconds: float = 1.0,
    batch_size: int = 128,
    aggregate: str = "mean",
    self_norm: bool = False,
    output: str = "prob",
    int8: bool = False,
    chunk: int | None = None,
) -> Dict[str, float]:
    """Per-file fake probability (or logit margin), aggregated over frames.

    ``self_norm`` estimates the per-channel normalization mean/std from the
    scored frames themselves (one extra transform pass) — an approximation
    of the training-corpus Welford stats for when the ``*_mean_std.pkl``
    is unavailable (e.g. the bundled reference checkpoints, which ship
    without stats; un-normalized log-packet inputs sit far outside the
    trained input distribution and saturate the classifier).

    ``int8`` quantizes the model post-training for the int8 MXU path
    (DCNN front convs / AST block matmuls, ops/quantize.py),
    absmax-calibrated on the first scored batches — a serving-throughput
    option the reference has no analogue for.
    """
    from ..data.wavio import audio_read
    from ..ops.audio import resample

    win = int(seconds * sample_rate)
    frames: List[np.ndarray] = []
    owners: List[int] = []
    for fi, path in enumerate(paths):
        audio, sr = audio_read(path)
        if sr > sample_rate:
            audio = resample(audio, sr, sample_rate)
        elif sr < sample_rate:
            raise RuntimeError(
                "Sample rate is smaller than desired sample rate. "
                "No upsampling possible here."
            )
        n = len(audio) // win
        for i in range(n):
            frames.append(audio[i * win : (i + 1) * win])
            owners.append(fi)
    if not frames:
        return {}

    if self_norm:
        from .transforms import compute_normalization, normalized_transform

        def _batches():
            for start in range(0, len(frames), batch_size):
                yield np.stack(frames[start : start + batch_size])[:, None, :]

        probe = np.asarray(
            transform(jnp.asarray(frames[0][None, None, :]))
        )
        mean, std = compute_normalization(transform, _batches(), probe.shape[1])
        transform = normalized_transform(transform, mean, std)

    if int8:
        from ..ops.quantize import DEFAULT_INT8_SITES, quantize_model

        if not hasattr(model, "quant"):
            raise ValueError(
                "int8 scoring supports the DCNN, LCNN and AST families "
                f"only (got {type(model).__name__})"
            )
        # DCNN: the six front convs (dilated block + head stay fp);
        # LCNN: all nine convs (BLSTM + fc stay fp);
        # AST: every block Dense layer (~94% of the forward FLOPs)
        from ..models.dcnn import DCNN

        include = DEFAULT_INT8_SITES if isinstance(model, DCNN) else None

        def _calib_images(max_batches: int = 4):
            for start in range(
                0, min(len(frames), max_batches * batch_size), batch_size
            ):
                chunk = np.stack(frames[start : start + batch_size])
                yield transform(jnp.asarray(chunk[:, None, :]))

        model, _ = quantize_model(
            model, variables, _calib_images(), include=include
        )
        # one-time weight quantization: the scorer reads int8 kernels from
        # HBM instead of requantizing the fp masters every dispatch
        from ..ops.quantize import bake_int8_weights

        variables = bake_int8_weights(
            model, variables, next(iter(_calib_images(1)))
        )

    if chunk is None:
        # auto: AST forwards lose VMEM residency at large batches — scan
        # microbatches of 32 inside the dispatch (measured +19-25% at
        # b128, docs/benchmarks.md "AST serving batch knee"); DCNN/LCNN
        # have no knee at these batch sizes.
        from ..models.ast import ASTModel

        chunk = 32 if isinstance(model, ASTModel) else 0
    score = make_score_fn(
        model, transform, variables, output=output, chunk=chunk
    )
    scores = np.zeros(len(frames), np.float32)
    # pipeline dispatches with a BOUNDED in-flight window: enqueueing a
    # batch before fetching the previous hides the ~85 ms relay round
    # trip, but enqueueing the whole corpus would hold every 11 MB input
    # buffer live in HBM at once (device OOM on large directories)
    max_inflight = 8
    outs: list = []

    def drain(until: int) -> None:
        while len(outs) > until:
            start, n, out = outs.pop(0)
            scores[start : start + n] = np.asarray(out)[:n]

    for start in range(0, len(frames), batch_size):
        chunk = frames[start : start + batch_size]
        batch = np.stack(chunk)[:, None, :]
        pad = batch_size - len(chunk)
        if pad:
            batch = np.concatenate(
                [batch, np.zeros((pad, 1, win), np.float32)]
            )
        outs.append((start, len(chunk), score(jnp.asarray(batch))))
        drain(max_inflight)
    drain(0)

    owners_arr = np.asarray(owners)
    agg = np.mean if aggregate == "mean" else np.max
    return {
        paths[fi]: float(agg(scores[owners_arr == fi]))
        for fi in np.unique(owners_arr)
    }


# --------------------------------------------------------------------- CLI


def build_scorer_from_snapshot(
    snapshot: str,
    norm: "str | None" = None,
    mean=None,
    std=None,
    log_scale: bool = True,
    expect_self_norm: bool = False,
    use_pallas: "bool | None" = None,
):
    """Rebuild (model, normalized transform, variables, cfg) from a snapshot.

    The snapshot filename encodes the experiment configuration (the
    reference's checkpoint-registry scheme, train_classifier.py:1221-1269;
    decoded by ``utils.naming.parse_model_file``); geometry that is NOT in
    the name — ``time_dim`` and ``flattend_size`` — is recovered from the
    imported tensors themselves.  ``norm`` names the ``*_mean_std.pkl``
    written at training time; without it (the bundled checkpoints ship
    none) scoring runs UN-normalized, which shifts probabilities — fine for
    ranking, not for threshold parity.
    """
    import pickle
    import warnings

    from ..models.dcnn import DCNN
    from ..models.factory import get_model
    from ..models.torch_import import (
        import_dcnn,
        import_lcnn,
        load_torch_state_dict,
    )
    from ..utils.config import default_config
    from ..utils.naming import parse_model_file
    from .transforms import make_transform, normalized_transform

    cfg = default_config()
    cfg.update(parse_model_file(snapshot))
    cfg.log_scale = log_scale
    base = make_transform(cfg, use_pallas=use_pallas)

    import os

    if norm is None and mean is None and std is None:
        # snapshots written by this framework's Trainer carry their
        # normalization stats as a sidecar — a .pt is then a complete
        # serving artifact (the reference keeps stats in a separate
        # log-dir pickle keyed by dataset name, wavelet_math.py:327-347)
        sidecar = snapshot + ".norm.pkl"
        if os.path.exists(sidecar):
            norm = sidecar
    if norm is not None:
        with open(norm, "rb") as fh:
            mean, std = pickle.load(fh)
    if mean is not None and std is not None:
        transform = normalized_transform(
            base,
            np.asarray(mean, np.float32),
            np.asarray(std, np.float32),
        )
    else:
        if not expect_self_norm:
            warnings.warn(
                "no normalization stats (--norm/--mean/--std/--self-norm): "
                "scoring un-normalized inputs; probabilities will be shifted "
                "vs the training-time pipeline"
            )
        transform = base

    state = load_torch_state_dict(snapshot)
    name = cfg.model_name
    if name == "LCNN":
        variables = import_lcnn(state)
        model = get_model(cfg, "lcnn")
    elif name.startswith("DCNN"):
        variables = import_dcnn(state)
        kw = {}
        if cfg.loss_less == "True":
            kw["in_channels"] = 2  # sign channel (reference wavelet_math.py:212)
        if "dil_1" in variables["params"]:
            kw["time_dim"] = int(
                variables["params"]["dil_1"]["Conv_0"]["kernel"].shape[2]
            )
        else:
            kw["with_dilation"] = False
        kw["flattend_size"] = int(
            variables["params"]["fc_1"]["kernel"].shape[0]
        )
        if name == "DCNNxDropout":
            kw["with_dropout"] = False
        model = DCNN(**kw)
    else:
        raise ValueError(
            f"snapshot model {name!r} has no standalone-scoring support "
            "(DCNN family and LCNN checkpoints are)"
        )
    return model, transform, variables, cfg


def estimate_norm_stats(
    snapshot: str,
    paths: Sequence[str],
    out: "str | None" = None,
    batch_size: int = 64,
    use_pallas: "bool | None" = None,
):
    """Estimate per-channel normalization stats from a clip set and (optionally)
    write them as the snapshot's ``.norm.pkl`` sidecar.

    For imported checkpoints that ship without training-corpus stats (the
    bundled reference checkpoints): Welford mean/std of the snapshot's own
    transform over ``paths``, the same estimator training uses (reference
    wavelet_math.py:419-441).  Returns ``(mean, std)``.  The approximation
    quality is clip-set dependent — see docs/parity.md.
    """
    import jax.numpy as jnp

    from ..data.wavio import audio_read
    from ..ops.audio import resample
    from .transforms import compute_normalization

    model, base, variables, cfg = build_scorer_from_snapshot(
        snapshot, expect_self_norm=True, use_pallas=use_pallas
    )
    sr, win = int(cfg.sample_rate), int(cfg.sample_rate * cfg.seconds)
    frames: List[np.ndarray] = []
    for path in _expand_inputs(paths):
        audio, in_sr = audio_read(path)
        if in_sr > sr:
            audio = resample(audio, in_sr, sr)
        for i in range(len(audio) // win):
            frames.append(audio[i * win : (i + 1) * win])
    if not frames:
        raise ValueError("no full frames decodable from the given paths")

    def _batches():
        for s in range(0, len(frames), batch_size):
            yield np.stack(frames[s : s + batch_size])[:, None, :]

    probe = np.asarray(base(jnp.asarray(frames[0][None, None, :])))
    mean, std = compute_normalization(base, _batches(), probe.shape[1])
    if out is not None:
        import pickle

        with open(out, "wb") as fh:
            pickle.dump([np.asarray(mean), np.asarray(std)], fh)
    return mean, std


def _expand_inputs(inputs) -> list:
    """Audio files from a mix of file and directory arguments."""
    import os

    exts = (".wav", ".flac")
    out = []
    for item in inputs:
        if os.path.isdir(item):
            out += sorted(
                os.path.join(item, f)
                for f in os.listdir(item)
                if f.lower().endswith(exts)
            )
        else:
            out.append(item)
    return out


def main(argv=None) -> None:
    """Score audio files with a trained snapshot: ``P(fake)`` per file.

    Serving entry the reference lacks (its closest mode is
    ``--only-testing`` over a prepared dataset); here any wav/flac file or
    directory is scored directly from a config-encoded snapshot.
    """
    import argparse
    import json

    parser = argparse.ArgumentParser(
        description="Score audio files with a trained deepfake detector"
    )
    parser.add_argument("snapshot", help=".pt snapshot (config-encoded name)")
    parser.add_argument("inputs", nargs="+", help="audio files or directories")
    parser.add_argument(
        "--norm", default=None, help="*_mean_std.pkl from training"
    )
    parser.add_argument("--mean", type=float, nargs="+", default=None)
    parser.add_argument("--std", type=float, nargs="+", default=None)
    parser.add_argument(
        "--aggregate", choices=["mean", "max"], default="mean",
        help="frame-score aggregation per file",
    )
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument(
        "--no-log-scale", action="store_true",
        help="snapshot was trained without log scaling (not filename-encoded)",
    )
    parser.add_argument(
        "--self-norm", action="store_true",
        help="estimate normalization stats from the scored files "
        "(approximation for snapshots without a *_mean_std.pkl)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="post-training int8 quantization (DCNN convs / AST block "
        "matmuls; calibrated on the first scored batches)",
    )
    parser.add_argument(
        "--chunk", type=int, default=None,
        help="scan the model forward over microbatches of this size "
        "inside each dispatch (default: auto — 32 for the AST, whole "
        "batch otherwise; 0 forces whole-batch)",
    )
    parser.add_argument("--json", action="store_true", dest="as_json")
    args = parser.parse_args(argv)

    if args.self_norm and (args.norm or args.mean or args.std):
        parser.error(
            "--self-norm conflicts with --norm/--mean/--std: the explicit "
            "stats already normalize the transform, and self-norm would "
            "normalize the result a second time"
        )

    model, transform, variables, cfg = build_scorer_from_snapshot(
        args.snapshot,
        norm=args.norm,
        mean=args.mean,
        std=args.std,
        log_scale=not args.no_log_scale,
        expect_self_norm=args.self_norm,
    )
    paths = _expand_inputs(args.inputs)
    scores = score_files(
        model,
        transform,
        variables,
        paths,
        sample_rate=int(cfg.sample_rate),
        seconds=float(cfg.seconds),
        batch_size=args.batch_size,
        aggregate=args.aggregate,
        self_norm=args.self_norm,
        int8=args.int8,
        chunk=args.chunk,
    )
    if args.as_json:
        print(json.dumps(scores, indent=2, sort_keys=True))
    else:
        for path in paths:
            if path in scores:
                print(f"{scores[path]:.4f}\t{path}")
            else:
                print(f"(shorter than {cfg.seconds}s, skipped)\t{path}")


if __name__ == "__main__":
    main()
