"""STFT spectrogram front-end, bit-compatible with ``torch.stft`` semantics.

Replaces the reference's ``torchaudio.transforms.Spectrogram`` (reference:
src/audiofakedetect/wavelet_math.py:25-68): center=True reflect padding,
periodic Hann window, onesided rFFT, magnitude raised to ``power``.
Default geometry ``n_fft=511, hop=220`` maps 1 s @ 22050 Hz to a
``(256, 101)`` image.

The frame gather + windowing + rFFT + |.|**power chain is left to XLA, which
fuses the elementwise parts into the FFT's pre/post passes on TPU.
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


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "power", "center", "log_scale")
)
def spectrogram(
    audio: jnp.ndarray,
    n_fft: int = 511,
    hop_length: int = 220,
    power: float = 2.0,
    center: bool = True,
    log_scale: bool = False,
) -> jnp.ndarray:
    """Compute ``|stft|**power`` like ``torchaudio.transforms.Spectrogram``.

    Args:
        audio: ``[..., T]`` waveform.
        power: exponent on the magnitude (2.0 = power spectrogram).
        log_scale: apply ``log(x + 1e-12)`` (reference STFTLayer.log_scale).

    Returns:
        ``[..., n_fft//2 + 1, n_frames]`` spectrogram, time last (matching
        torch layout).
    """
    win = hann_window(n_fft, dtype=audio.dtype)
    if center:
        pad = [(0, 0)] * (audio.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        audio = jnp.pad(audio, pad, mode="reflect")
    t = audio.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = audio[..., idx] * win  # [..., n_frames, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag**power
    out = jnp.swapaxes(mag, -1, -2)  # [..., freq, time]
    if log_scale:
        out = jnp.log(out + 1e-12)
    return out
