"""Continuous wavelet transform (pywt/ptwt-compatible semantics).

Used by the offline analysis layer for scalogram figures (reference:
src/audiofakedetect/plot_util.py:232-262 calls ``ptwt.cwt`` with a complex
Shannon wavelet ``shan{bandwidth}-{center_freq}``).

Algorithm follows pywt's ``cwt``: the mother wavelet's antiderivative is
sampled per scale, convolved with the signal, differentiated and scaled by
``-sqrt(scale)``.  Convolutions run as one batched FFT multiply (all scales
at once) — the hot path on device is two FFTs instead of per-scale loops.
"""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np


def shannon_wavelet(bandwidth: float, center_freq: float, precision: int = 10):
    """Complex Shannon wavelet psi on pywt's default [-8, 8] grid."""
    n = 2**precision
    x = np.linspace(-8.0, 8.0, n)
    psi = (
        np.sqrt(bandwidth)
        * np.sinc(bandwidth * x)
        * np.exp(2j * np.pi * center_freq * x)
    )
    return psi, x


def _parse_wavelet(name: str) -> Tuple[float, float]:
    m = re.match(r"^shan([0-9.]+)-([0-9.]+)$", name)
    if not m:
        raise ValueError(
            f"Unsupported CWT wavelet {name!r}; expected 'shan<bw>-<fc>'."
        )
    return float(m.group(1)), float(m.group(2))


def scale2frequency(wavelet: str, scales: np.ndarray) -> np.ndarray:
    """Center frequency of the scaled wavelet in cycles per sample."""
    _, fc = _parse_wavelet(wavelet)
    return fc / np.asarray(scales, dtype=np.float64)


def cwt(
    data: np.ndarray,
    scales: np.ndarray,
    wavelet: str,
    sampling_period: float = 1.0,
    precision: int = 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """pywt-style CWT.

    Args:
        data: ``[..., T]`` real signal.
        scales: 1-D array of dilation scales.
        wavelet: ``"shan<bw>-<fc>"`` complex Shannon spec.

    Returns:
        (coefficients ``[num_scales, ..., T]`` complex, frequencies in Hz).
    """
    bandwidth, center = _parse_wavelet(wavelet)
    psi, x = shannon_wavelet(bandwidth, center, precision)
    int_psi = np.cumsum(psi) * (x[1] - x[0])
    scales = np.asarray(scales, dtype=np.float64)

    data = np.asarray(data)
    t = data.shape[-1]
    flat = data.reshape(-1, t).astype(np.float64)

    coefs = []
    for scale in scales:
        j = np.arange(scale * (x[-1] - x[0]) + 1) / (scale * (x[1] - x[0]))
        j = j.astype(np.int64)
        j = j[j < int_psi.size]
        kernel = int_psi[j][::-1]
        k = kernel.size
        n_fft = int(2 ** np.ceil(np.log2(t + k - 1)))
        sig_f = np.fft.fft(flat, n_fft, axis=-1)
        ker_f = np.fft.fft(kernel, n_fft)
        conv = np.fft.ifft(sig_f * ker_f, axis=-1)[..., : t + k - 1]
        coef = -np.sqrt(scale) * np.diff(conv, axis=-1)
        # crop to signal length (centered), like pywt
        d = (coef.shape[-1] - t) / 2.0
        start = int(np.floor(d))
        coef = coef[..., start : start + t] if d > 0 else coef
        coefs.append(coef)
    out = np.stack(coefs).reshape((len(scales),) + data.shape)
    freqs = scale2frequency(wavelet, scales) / sampling_period
    return out, freqs
