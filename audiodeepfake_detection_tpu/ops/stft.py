"""STFT spectrogram front-end, bit-compatible with ``torch.stft`` semantics.

Replaces the reference's ``torchaudio.transforms.Spectrogram`` (reference:
src/audiofakedetect/wavelet_math.py:25-68): center=True reflect padding,
periodic Hann window, onesided rFFT, magnitude raised to ``power``.
Default geometry ``n_fft=511, hop=220`` maps 1 s @ 22050 Hz to a
``(256, 101)`` image.

Two device paths:

* ``method="matmul"`` (default for ``n_fft <= 2048``): the windowed rFFT is
  ONE real matmul ``frames @ (win * [cos | -sin])`` with a ``[n_fft,
  2*n_bins]`` constant — for n_fft=511 that is a ``[.., 511] @ [511, 512]``
  MXU-perfect shape.  TPU has no FFT hardware (XLA lowers fft to a slow
  generic custom call); at spectrogram sizes the O(n^2) DFT on the MXU is
  far faster AND exact to fp32 roundoff (computed at ``Precision.HIGHEST``;
  matrices built in float64 then rounded).  Measured: stft+DCNN train step
  13.98 -> see docs/benchmarks.md.
* ``method="fft"``: ``jnp.fft.rfft`` — kept for large ``n_fft`` and as the
  cross-check oracle (tests assert the two paths agree).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window(periodic=True))."""
    k = np.arange(n)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)
    return jnp.asarray(w, dtype=dtype)


@functools.lru_cache(maxsize=8)
def _windowed_rdft_matrix(n_fft: int) -> np.ndarray:
    """``[n_fft, 2*(n_fft//2+1)]`` windowed real-DFT matrix ``win * [C | -S]``
    in float64, rounded to f32 at use: ``frames_raw @ M = [re | im]`` of
    ``rfft(frames_raw * win)``."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_fft, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n_fft)
    ang = 2.0 * np.pi * np.outer(k, np.arange(n_bins, dtype=np.float64)) / n_fft
    mat = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    return (win[:, None] * mat).astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "power", "center", "log_scale", "method"
    ),
)
def spectrogram(
    audio: jnp.ndarray,
    n_fft: int = 511,
    hop_length: int = 220,
    power: float = 2.0,
    center: bool = True,
    log_scale: bool = False,
    method: str = "auto",
) -> jnp.ndarray:
    """Compute ``|stft|**power`` like ``torchaudio.transforms.Spectrogram``.

    Args:
        audio: ``[..., T]`` waveform.
        power: exponent on the magnitude (2.0 = power spectrogram).
        log_scale: apply ``log(x + 1e-12)`` (reference STFTLayer.log_scale).
        method: ``"matmul"`` (windowed-DFT matmul on the MXU), ``"fft"``
            (``jnp.fft.rfft``), or ``"auto"`` (matmul for n_fft <= 2048).

    Returns:
        ``[..., n_fft//2 + 1, n_frames]`` spectrogram, time last (matching
        torch layout).
    """
    if method not in ("auto", "matmul", "fft"):
        raise ValueError(
            f"spectrogram method must be 'auto', 'matmul' or 'fft', got "
            f"{method!r}"
        )
    if method == "auto":
        method = "matmul" if n_fft <= 2048 else "fft"
    n_bins = n_fft // 2 + 1
    if center:
        pad = [(0, 0)] * (audio.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        audio = jnp.pad(audio, pad, mode="reflect")
    t = audio.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = audio[..., idx]  # [..., n_frames, n_fft] (window not applied)
    if method == "matmul":
        mat = jnp.asarray(_windowed_rdft_matrix(n_fft), frames.dtype)
        reim = jax.lax.dot_general(
            frames,
            mat,
            (((frames.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [..., n_frames, 2*n_bins]
        sq = (
            jax.lax.square(reim[..., :n_bins])
            + jax.lax.square(reim[..., n_bins:])
        )
        if power == 2.0:
            mag = sq
        elif power == 1.0:
            mag = jnp.sqrt(sq)
        else:
            mag = sq ** (power / 2.0)
    else:
        win = hann_window(n_fft, dtype=audio.dtype)
        spec = jnp.fft.rfft(frames * win, axis=-1)
        mag = jnp.abs(spec)
        if power != 1.0:
            mag = mag**power
    out = jnp.swapaxes(mag, -1, -2)  # [..., freq, time]
    if log_scale:
        out = jnp.log(out + 1e-12)
    return out
