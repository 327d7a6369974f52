"""GAN "fingerprint" extraction: mean WPT / rFFT spectra per generator.

Parity target: reference scripts/freq_visual/fingerprints.py —
per-generator mean absolute level-14 Haar wavelet-packet spectra over full
clips (:105-126) and mean absolute rFFT spectra including an audible
reconstruction of the fingerprint (:38-86), plus difference plots vs the
real corpus.

The deep (level-14) WPT over full clips is the long-sequence workload of
this domain; ``wpt_fingerprint`` runs the same mesh-sharded cascade as
training (time is embarrassingly parallel within a level; for multi-chip
sharding of very long clips see ``parallel/sequence.py``).  The
time-sharded ``sp_wpt_analysis`` is a drop-in equal of ``wpt_analysis``
(to fp32 roundoff) for every wavelet, trailing reflect-boundary
coefficients included — the last shard emits them locally since it holds
the global right edge (parallel/sequence.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..data.wavio import audio_read
from ..ops.wpt import wpt_analysis


def mean_wpt_spectrum(
    clips: Sequence[np.ndarray],
    wavelet: str = "haar",
    level: int = 14,
    mesh=None,
    axis: str = "data",
) -> np.ndarray:
    """Mean |WPT| spectrum over clips: mean over time and clips -> [2**level].

    ``mesh``: a ``jax.sharding.Mesh`` — shards the time axis of each clip
    over the mesh and runs the sequence-parallel cascade
    (``parallel/sequence.py``), the design point of SP-WPT: a level-14
    packet transform over a full multi-second recording exceeds what one
    chip should chew serially.  Clips are cropped to the SP alignment
    (``shards * 2**level``); a clip too short for the sharded cascade
    falls back to the dense single-device transform (identical numerics —
    the two are equality-tested in tests/test_parallel.py).
    """
    import jax.numpy as jnp

    shards = int(mesh.shape[axis]) if mesh is not None else 1
    min_sp_len = 0
    if mesh is not None:
        from ..parallel.sequence import sp_wpt_analysis, sp_wpt_min_len

        min_sp_len = sp_wpt_min_len(wavelet, level, shards)

    acc: Optional[np.ndarray] = None
    count = 0
    for clip in clips:
        block = shards << level
        t_sp = (len(clip) // block) * block
        # eligibility rule lives in parallel/sequence.py (alignment +
        # per-shard interiors longer than the filter overhang)
        if mesh is not None and t_sp >= min_sp_len:
            wp = sp_wpt_analysis(
                jnp.asarray(clip[None, :t_sp], jnp.float32),
                wavelet, level, mesh, axis,
            )
        else:
            t = (len(clip) >> level) << level
            if t == 0:
                continue
            wp = wpt_analysis(
                jnp.asarray(clip[None, :t], jnp.float32), wavelet, level
            )
        spec = np.abs(np.asarray(wp[0])).mean(-1)
        acc = spec if acc is None else acc + spec
        count += 1
    assert acc is not None, "no clips long enough for the requested level"
    return acc / count


def mean_rfft_spectrum(clips: Sequence[np.ndarray], n: int = 2**14) -> np.ndarray:
    """Mean |rFFT| over fixed-length windows of the clips -> [n//2 + 1]."""
    acc = np.zeros(n // 2 + 1)
    count = 0
    for clip in clips:
        for start in range(0, len(clip) - n + 1, n):
            acc += np.abs(np.fft.rfft(clip[start : start + n]))
            count += 1
    assert count > 0
    return acc / count


def fingerprint_audio(spectrum: np.ndarray, n: int = 2**14) -> np.ndarray:
    """Reconstruct an audible waveform from an rFFT fingerprint
    (reference fingerprints.py:70-86 renders the fingerprint to wav)."""
    return np.fft.irfft(spectrum, n=n).astype(np.float32)


def load_clips(
    directory: str, max_files: int = 128, file_type: str = "wav"
) -> List[np.ndarray]:
    files = sorted(
        f for f in os.listdir(directory) if f.endswith("." + file_type)
    )[:max_files]
    clips = []
    for f in files:
        audio, _ = audio_read(os.path.join(directory, f))
        clips.append(audio)
    return clips


def generator_fingerprints(
    data_path: str,
    generators: Sequence[str],
    real_name: str = "real",
    wavelet: str = "haar",
    level: int = 14,
    max_files: int = 128,
    mesh=None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Per-generator mean spectra and differences against the real corpus.

    ``mesh`` shards each clip's time axis for the deep WPT (see
    :func:`mean_wpt_spectrum`).
    """
    dirs = {d.split("_")[-1]: d for d in os.listdir(data_path)}
    out: Dict[str, Dict[str, np.ndarray]] = {}
    real_clips = load_clips(os.path.join(data_path, dirs[real_name]), max_files)
    real_wpt = mean_wpt_spectrum(real_clips, wavelet, level, mesh=mesh)
    real_fft = mean_rfft_spectrum(real_clips)
    out[real_name] = {"wpt": real_wpt, "rfft": real_fft}
    for gen in generators:
        if gen == real_name:
            continue
        clips = load_clips(os.path.join(data_path, dirs[gen]), max_files)
        wpt = mean_wpt_spectrum(clips, wavelet, level, mesh=mesh)
        fft = mean_rfft_spectrum(clips)
        out[gen] = {
            "wpt": wpt,
            "rfft": fft,
            "wpt_diff": wpt - real_wpt,
            "rfft_diff": fft - real_fft,
        }
    return out
