"""Linear-frequency cepstral coefficients (LFCC) and delta features.

TPU-native equivalent of the reference's ``LFCC`` module and
``torchaudio.transforms.ComputeDeltas`` usage (reference:
src/audiofakedetect/wavelet_math.py:71-164, 316-323).  The filterbank and DCT
matrices follow ``torchaudio.functional.linear_fbanks`` / ``create_dct``; on
device the whole feature stack is two matmuls plus elementwise ops, which XLA
maps straight onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def linear_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_filter: int,
    sample_rate: int,
) -> np.ndarray:
    """Triangular linear filterbank, shape ``(n_freqs, n_filter)``.

    Matches ``torchaudio.functional.linear_fbanks``.
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    f_pts = np.linspace(f_min, f_max, n_filter + 2)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_filter + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_filter + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


def create_dct(n_mfcc: int, n_mels: int, norm: str = "ortho") -> np.ndarray:
    """DCT-II basis, shape ``(n_mels, n_mfcc)`` (torchaudio.functional.create_dct)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[:, None]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)  # (n_mfcc, n_mels)
    if norm is None:
        dct *= 2.0
    else:
        assert norm == "ortho"
        dct[0] *= 1.0 / np.sqrt(2.0)
        dct *= np.sqrt(2.0 / n_mels)
    return dct.T.astype(np.float32)


def amplitude_to_db(
    x: jnp.ndarray, top_db: float = 80.0, amin: float = 1e-10
) -> jnp.ndarray:
    """Power -> dB with per-sample top_db clamp (torchaudio AmplitudeToDB)."""
    db = 10.0 * jnp.log10(jnp.maximum(x, amin))
    axes = tuple(range(1, x.ndim))
    peak = jnp.max(db, axis=axes, keepdims=True)
    return jnp.maximum(db, peak - top_db)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sample_rate",
        "n_lin",
        "n_lfcc",
        "f_min",
        "f_max",
        "num_of_scales",
        "log_lf",
    ),
)
def lfcc(
    specgram: jnp.ndarray,
    sample_rate: int = 22050,
    n_lin: int = 20,
    n_lfcc: int = 20,
    f_min: float = 0.0,
    f_max: float = 11025.0,
    num_of_scales: int = 150,
    log_lf: bool = True,
) -> jnp.ndarray:
    """LFCC features from a spectrogram/scalogram ``[..., F, T]``.

    Mirrors the reference forward (src/audiofakedetect/wavelet_math.py:138-164):
    filterbank matmul, log (or dB) scaling, DCT matmul.  Leading axes are
    collapsed and returned as ``[B, 1, n_lfcc, T]`` exactly like the reference
    (which drops the original channel axis via ``unsqueeze(1)``).
    """
    f, t = specgram.shape[-2], specgram.shape[-1]
    x = specgram.reshape(-1, f, t)
    fb = jnp.asarray(linear_fbanks(num_of_scales, f_min, f_max, n_lin, sample_rate))
    x = jnp.einsum("bft,fl->blt", x, fb, precision=jax.lax.Precision.HIGHEST)
    x = x[:, None]  # [B, 1, n_lin, T]
    if log_lf:
        x = jnp.log(x + 1e-12)
    else:
        x = amplitude_to_db(x)
    dct = jnp.asarray(create_dct(n_lfcc, n_lin, "ortho"))
    out = jnp.einsum("bclt,lk->bckt", x, dct, precision=jax.lax.Precision.HIGHEST)
    return out


@functools.partial(jax.jit, static_argnames=("win_length",))
def compute_deltas(x: jnp.ndarray, win_length: int = 5) -> jnp.ndarray:
    """Delta features over the last axis (torchaudio ComputeDeltas, replicate pad)."""
    n = (win_length - 1) // 2
    denom = 2.0 * sum(i * i for i in range(1, n + 1))
    pad = [(0, 0)] * (x.ndim - 1) + [(n, n)]
    xp = jnp.pad(x, pad, mode="edge")
    kernel = jnp.arange(-n, n + 1, dtype=x.dtype) / denom
    out = jnp.zeros_like(x)
    for i, c in enumerate(np.arange(-n, n + 1)):
        out = out + kernel[i] * jax.lax.dynamic_slice_in_dim(
            xp, i, x.shape[-1], axis=-1
        )
    return out
