"""Transform pipeline factory: audio batch -> normalized model input image.

Equivalent of the reference's ``get_transforms``
(reference: src/audiofakedetect/wavelet_math.py:266-452), as a pure function
suitable for fusion into the jitted train/eval step.  The reference computes
the transform under ``torch.no_grad`` in a separate pass
(train_classifier.py:965-967); here it simply lives in front of the model
inside one jit — XLA fuses log/normalize into the surrounding ops and no
gradient flows into it because no parameters feed it.

Normalization statistics are computed with a jitted Welford pass over the
training loader (``compute_normalization``) and cached as a pickle keyed by
the same config string the reference uses.
"""

from __future__ import annotations

import math
import os
import pickle
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lfcc import compute_deltas, lfcc
from ..ops.normalize import (
    normalize,
    welford_finalize,
    welford_init,
    welford_update,
)
from ..ops.stft import spectrogram
from ..ops.wpt import packet_image
from ..utils.config import DotDict
from ..utils.naming import norm_cache_prefix

TransformFn = Callable[[jnp.ndarray], jnp.ndarray]


def make_transform(args: DotDict, use_pallas: "bool | None" = None) -> TransformFn:
    """Build the time-frequency transform: ``[B, 1, T] -> [B, C, F, T']``.

    ``use_pallas`` forces the WPT implementation (None = backend default:
    the fused Mosaic kernel on TPU, the XLA conv cascade elsewhere).
    ``False`` is required for portable / symbolic-batch ``jax.export``
    artifacts: the Mosaic custom call only lowers on TPU and its grid
    needs a concrete batch (see train/export.py).
    """
    features = args.features or "none"
    log_scale = features == "none" and args.log_scale
    loss_less = args.loss_less == "True" or args.loss_less is True

    if args.transform == "stft":
        if loss_less:
            raise ValueError(
                "Sign channel not possible for stft due to complex data type."
            )
        n_fft = args.num_of_scales * 2 - 1

        def base(audio: jnp.ndarray) -> jnp.ndarray:
            return spectrogram(
                audio,
                n_fft=n_fft,
                hop_length=args.hop_length,
                power=args.power,
                log_scale=bool(log_scale),
            )

    elif args.transform == "packets":
        level = int(math.log2(args.num_of_scales))
        # speed mode (config dtype: bfloat16) runs the Pallas WPT's banded
        # dots in one bf16 MXU pass; the default stays fp32-exact (HIGHEST)
        wpt_precision = (
            jax.lax.Precision.DEFAULT
            if str(args.dtype) == "bfloat16"
            else None
        )

        def base(audio: jnp.ndarray) -> jnp.ndarray:
            return packet_image(
                audio,
                args.wavelet,
                level=level,
                log_scale=bool(log_scale),
                loss_less=loss_less,
                power=args.power,
                block_norm=bool(args.block_norm),
                use_pallas=use_pallas,
                precision=wpt_precision,
            )

    else:
        raise ValueError(f"Unknown transform {args.transform!r}")

    stack = [base]
    if "lfcc" in features or "delta" in features:

        def lfcc_step(x: jnp.ndarray) -> jnp.ndarray:
            return lfcc(
                x,
                sample_rate=args.sample_rate,
                f_min=args.f_min,
                f_max=args.f_max,
                num_of_scales=args.num_of_scales,
            )

        stack.append(lfcc_step)
    if "delta" in features:
        stack.append(compute_deltas)
    if "doubledelta" in features:
        stack.append(compute_deltas)

    def transform(audio: jnp.ndarray) -> jnp.ndarray:
        x = audio
        for fn in stack:
            x = fn(x)
        return x

    return transform


def compute_normalization(
    transform: TransformFn,
    batches,
    num_channels: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Welford mean/std of the transformed training set, per channel.

    ``batches`` yields host audio arrays ``[B, 1, T]``.  The reference
    iterates the training set at batch size 4000 and reduces over
    (batch, time, freq) keeping channels (reference:
    wavelet_math.py:419-441, permute at :440).
    """
    state = welford_init(num_channels)
    for batch in batches:
        image = transform(jnp.asarray(batch))  # [B, C, F, T]
        state = welford_update(state, jnp.transpose(image, (0, 3, 2, 1)))
    mean, std = welford_finalize(state)
    return np.asarray(mean), np.asarray(std)


def compute_block_norm_stats(
    args: DotDict,
    batches,
) -> dict:
    """Per-packet-node Welford statistics over the training set.

    The reference collects a Welford estimator per WPT node while computing
    normalization (wavelet_math.py:194-200) and stores the finalized
    ``{node: {mean, std}}`` dict (``*_mean_std_bn`` cache; the reference
    saves it as ``.pkl`` but loads ``.pt`` — a bug we do not replicate, one
    path is used for both).  Node keys are the Gray-code frequency indices.
    """
    import jax.numpy as jnp

    from ..ops.normalize import welford_finalize, welford_init, welford_update
    from ..ops.wpt import wpt_analysis

    level = int(math.log2(args.num_of_scales))
    state = welford_init(int(args.num_of_scales))
    for batch in batches:
        audio = jnp.asarray(batch)
        if audio.ndim == 3:
            audio = audio.reshape(-1, audio.shape[-1])
        wp = wpt_analysis(audio, args.wavelet, level)  # [B, nodes, n]
        state = welford_update(state, jnp.transpose(wp, (0, 2, 1)))
    mean, std = welford_finalize(state)
    mean = np.asarray(mean)
    std = np.asarray(std)
    return {
        int(node): {"mean": float(mean[node]), "std": float(std[node])}
        for node in range(int(args.num_of_scales))
    }


def get_transforms(
    args: DotDict,
    train_batches: Optional[Callable[[], object]] = None,
    verbose: bool = True,
) -> Tuple[TransformFn, np.ndarray, np.ndarray]:
    """Build transform + normalization stats with the reference's caching.

    Returns ``(transform, mean, std)``; pass the stats to
    :func:`normalized_transform`.
    """
    transform = make_transform(args)
    loss_less = args.loss_less == "True" or args.loss_less is True
    num_channels = 2 if loss_less else 1

    if args.block_norm:
        # block normalisation replaces dataset mean/std (reference
        # wavelet_math.py:373-375); per-node Welford stats are cached for
        # analysis like the reference's *_mean_std_bn file
        if (
            args.data_path is not None
            and args.log_dir is not None
            and train_batches is not None
        ):
            cache = norm_cache_prefix(args) + "_mean_std_bn.pkl"
            if not os.path.exists(cache) and args.calc_normalization:
                stats = compute_block_norm_stats(args, train_batches())
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                with open(cache, "wb") as fh:
                    pickle.dump(stats, fh)
        return transform, np.zeros(num_channels, np.float32), np.ones(
            num_channels, np.float32
        )

    mean = np.asarray(args.mean, dtype=np.float32)
    std = np.asarray(args.std, dtype=np.float32)
    if args.data_path is not None and args.log_dir is not None:
        cache = norm_cache_prefix(args) + "_mean_std.pkl"
        if os.path.exists(cache):
            if verbose:
                print("Loading pre calculated mean and std from file.")
            with open(cache, "rb") as fh:
                mean, std = pickle.load(fh)
            mean = np.asarray(mean, dtype=np.float32)
            std = np.asarray(std, dtype=np.float32)
        elif args.calc_normalization and train_batches is not None:
            if verbose:
                print("computing mean and std values.", flush=True)
            mean, std = compute_normalization(
                transform, train_batches(), num_channels
            )
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            with open(cache, "wb") as fh:
                pickle.dump([mean, std], fh)
    return transform, mean, std


def normalized_transform(
    transform: TransformFn, mean: np.ndarray, std: np.ndarray
) -> TransformFn:
    def fn(audio: jnp.ndarray) -> jnp.ndarray:
        return normalize(transform(audio), mean, std)

    return fn
