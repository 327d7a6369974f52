"""Wavelet packet transform (WPT) as pure JAX/XLA ops.

TPU-native re-design of the reference's ptwt-based packet front-end
(reference: src/audiofakedetect/wavelet_math.py:167-263).  Semantics match
ptwt's ``WaveletPacket(data, wavelet, mode="reflect")`` +
``get_level(level)`` (Gray-code/frequency node ordering):

* per level, the signal is reflect-padded with ``padl = (2L-3)//2`` and
  ``padr = padl + (n % 2)`` and cross-correlated with the *flipped*
  decomposition filters at stride 2 (== convolution with dec_lo/dec_hi),
  reproducing the pywt length rule ``n' = floor((n + L - 1)/2)``;
* node ordering of ``get_level`` is the Gray-code ("frequency") order, i.e.
  frequency index ``i`` maps to natural tree index ``i ^ (i >> 1)``.

The whole cascade is expressed with the node axis folded into the batch so
every level is a single strided convolution — XLA lays this out as a handful
of fused HLOs; there is no per-node Python loop at runtime.  A fused Pallas
kernel for the full cascade lives in ``wpt_pallas.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .wavelets import Wavelet, get_wavelet


def graycode_permutation(level: int) -> np.ndarray:
    """Frequency-order -> natural-order node index map for ``2**level`` nodes.

    ptwt's ``get_level`` enumerates nodes in Gray-code order (ptwt
    ``WaveletPacket.get_graycode_order``); entry ``i`` of the returned array
    is the natural (binary: 'a'=0,'d'=1, first filter = MSB) index of the
    ``i``-th frequency-ordered node.
    """
    idx = np.arange(2**level)
    return idx ^ (idx >> 1)


def _dec_kernel(wavelet: Wavelet, dtype) -> jnp.ndarray:
    """Stacked [2, 1, L] analysis kernel (flipped dec_lo / dec_hi)."""
    dec_lo = np.asarray(wavelet.dec_lo, dtype=np.float64)[::-1]
    dec_hi = np.asarray(wavelet.dec_hi, dtype=np.float64)[::-1]
    k = np.stack([dec_lo, dec_hi])[:, None, :]
    return jnp.asarray(k, dtype=dtype)


def dwt_level(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """One analysis level on ``[B, N, n]`` -> ``[B, 2N, n']`` (natural order).

    ``kernel`` is the ``[2, 1, L]`` flipped filter stack from
    :func:`_dec_kernel`.
    """
    b, nodes, n = x.shape
    filt_len = kernel.shape[-1]
    padl = (2 * filt_len - 3) // 2
    padr = padl + (n % 2)
    x = x.reshape(b * nodes, 1, n)
    x = jnp.pad(x, ((0, 0), (0, 0), (padl, padr)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(2,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(b, 2 * nodes, y.shape[-1])


def wpt_output_length(n: int, filt_len: int, level: int) -> int:
    """pywt length rule applied ``level`` times: n' = floor((n + L - 1)/2)."""
    for _ in range(level):
        n = (n + filt_len - 1) // 2
    return n


@functools.partial(jax.jit, static_argnames=("wavelet_name", "level", "natural_order"))
def wpt_analysis(
    x: jnp.ndarray,
    wavelet_name: str,
    level: int,
    natural_order: bool = False,
) -> jnp.ndarray:
    """Full wavelet packet decomposition.

    Args:
        x: audio ``[B, T]`` (float).
        wavelet_name: pywt-style name (haar/dbN/symN/coifN).
        level: decomposition depth; produces ``2**level`` sub-bands.
        natural_order: if True keep the natural tree order instead of the
            Gray-code frequency order ptwt's ``get_level`` uses.

    Returns:
        packets ``[B, 2**level, n_level]``.
    """
    wavelet = get_wavelet(wavelet_name)
    kernel = _dec_kernel(wavelet, x.dtype)
    y = x[:, None, :]
    for _ in range(level):
        y = dwt_level(y, kernel)
    if not natural_order:
        y = y[:, graycode_permutation(level), :]
    return y


def _rec_kernel(wavelet: Wavelet, dtype) -> jnp.ndarray:
    """``[1, 2, L]`` synthesis kernel.

    Synthesis is ``x[t] = sum_c sum_s y_c[s] * rec_c[t - 2s]`` — a
    convolution with the rec filters, expressed below as a correlation, hence
    the kernel holds the *flipped* rec filters (== the dec filters).
    """
    k = np.stack([wavelet.dec_lo, wavelet.dec_hi])[None, :, :]
    return jnp.asarray(k, dtype=dtype)


def idwt_level(y: jnp.ndarray, kernel: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Inverse of :func:`dwt_level`: ``[B, 2N, n']`` -> ``[B, N, out_len]``.

    Upsample-by-2 (via lhs dilation) + convolution with the reconstruction
    filters, then crop the analysis padding ``padl`` from the left —
    reconstructing the interior of the reflect-padded analysis signal, which
    contains the original samples exactly.
    """
    b, nodes2, n = y.shape
    nodes = nodes2 // 2
    filt_len = kernel.shape[-1]
    padl = (2 * filt_len - 3) // 2
    y = y.reshape(b * nodes, 2, n)
    x = jax.lax.conv_general_dilated(
        y,
        kernel,
        window_strides=(1,),
        padding=[(filt_len - 1, filt_len - 1)],
        lhs_dilation=(2,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.dynamic_slice_in_dim(x, padl, out_len, axis=-1)
    return x.reshape(b, nodes, out_len)


def wpt_synthesis(
    packets: jnp.ndarray,
    wavelet_name: str,
    level: int,
    out_len: int,
    natural_order: bool = False,
) -> jnp.ndarray:
    """Inverse WPT; reconstructs ``[B, T]`` from ``[B, 2**level, n_level]``."""
    wavelet = get_wavelet(wavelet_name)
    kernel = _rec_kernel(wavelet, packets.dtype)
    if not natural_order:
        inv = np.argsort(graycode_permutation(level))
        packets = packets[:, inv, :]
    lengths = [out_len]
    for _ in range(level - 1):
        lengths.append(wpt_output_length(lengths[-1], wavelet.dec_len, 1))
    y = packets
    for lev in range(level):
        y = idwt_level(y, kernel, lengths[level - 1 - lev])
    return y[:, 0, :]


def packet_image(
    audio: jnp.ndarray,
    wavelet_name: str,
    level: int = 8,
    log_scale: bool = False,
    loss_less: bool = False,
    power: float = 2.0,
    block_norm: bool = False,
    block_norm_scale: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    precision: Optional[jax.lax.Precision] = None,
) -> jnp.ndarray:
    """Packet time-frequency image, matching the reference ``Packets`` module.

    Reference: src/audiofakedetect/wavelet_math.py:167-263 — WPT, optional
    per-node block normalisation, optional ``log(|x|**power + 1e-12)``
    scaling, optional sign channel ("loss_less").

    Args:
        audio: ``[B, T]`` or ``[B, 1, T]`` waveform batch.
        block_norm: divide each node by the max absolute value of that node
            over the whole batch — the reference's runtime block
            normalisation (wavelet_math.py:202-203: the divisor is the
            current batch's per-node max, so normalisation depends on batch
            composition; replicated as-is).
        block_norm_scale: optional precomputed per-node scale ``[2**level]``
            applied as ``packets / scale`` (batch-independent alternative).
        precision: matmul precision for the Pallas kernel's banded dots
            (None -> HIGHEST, the fp32-exact parity contract; speed mode
            passes ``Precision.DEFAULT`` = one bf16 MXU pass).

    Returns:
        ``[B, C, 2**level, n_level]`` with C = 2 if ``loss_less`` else 1,
        i.e. (batch, channels, packets, time) like the reference's
        ``Packets.forward`` output after its final permute.
    """
    if audio.ndim == 3:
        audio = audio.reshape(audio.shape[0] * audio.shape[1], audio.shape[-1])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # fused MXU kernel (~40x the XLA cascade on v5e); log applied below so
        # block_norm / sign extraction see raw coefficients
        from .wpt_pallas import wpt_packets_pallas

        wp = wpt_packets_pallas(
            audio,
            wavelet_name,
            level,
            precision=precision or jax.lax.Precision.HIGHEST,
        )
    else:
        wp = wpt_analysis(audio, wavelet_name, level)  # [B, 2**l, n_l]
    if block_norm:
        wp = wp / jnp.max(jnp.abs(wp), axis=(0, 2), keepdims=True)
    if block_norm_scale is not None:
        wp = wp / block_norm_scale[None, :, None]
    if log_scale:
        wp_log = jnp.log(jnp.abs(wp) ** power + 1e-12)
        if loss_less:
            sign = jnp.where(wp < 0, -1.0, 1.0).astype(wp.dtype)
            return jnp.stack([wp_log, sign], axis=1)
        return wp_log[:, None]
    return wp[:, None]
