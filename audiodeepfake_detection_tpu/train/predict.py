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


def make_score_fn(model, transform: Callable, variables) -> Callable:
    """Jitted ``[B, 1, T] audio -> [B] P(fake)``."""

    @jax.jit
    def score(audio: jnp.ndarray) -> jnp.ndarray:
        image = transform(audio)
        logits = model.apply(variables, image, train=False)
        return jax.nn.softmax(logits, axis=-1)[:, 1]

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
) -> Dict[str, float]:
    """Per-file fake probability, aggregated over 1 s frames."""
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

    score = make_score_fn(model, transform, variables)
    scores = np.zeros(len(frames), np.float32)
    for start in range(0, len(frames), batch_size):
        chunk = frames[start : start + batch_size]
        batch = np.stack(chunk)[:, None, :]
        pad = batch_size - len(chunk)
        if pad:
            batch = np.concatenate(
                [batch, np.zeros((pad, 1, win), np.float32)]
            )
        out = np.asarray(score(jnp.asarray(batch)))[: len(chunk)]
        scores[start : start + len(chunk)] = out

    owners_arr = np.asarray(owners)
    agg = np.mean if aggregate == "mean" else np.max
    return {
        paths[fi]: float(agg(scores[owners_arr == fi]))
        for fi in np.unique(owners_arr)
    }
