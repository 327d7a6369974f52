"""Fuzz/robustness tests for the native wav/FLAC decoders.

Locks the malformed-file hardening (csrc/wavio.cpp, csrc/flacdec.cpp):
truncated, bit-flipped, or wrong-format files must produce clean Python
errors (or clean failure return codes) — never crashes, hangs, or silent
garbage audio.  The reference delegates this to libsox/ffmpeg; a
from-scratch decoder needs its own safety net.
"""

import struct
import wave as wave_mod

import numpy as np
import pytest

from audiodeepfake_detection_tpu.data.wavio import (
    audio_info,
    audio_read,
    wav_read_batch,
)


def _write_wav(path, pcm, sr=16000):
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.astype("<i2").tobytes())


@pytest.fixture()
def good_wav(tmp_path):
    path = tmp_path / "good.wav"
    rng = np.random.RandomState(0)
    _write_wav(path, (rng.randn(8000) * 3000).astype(np.int16))
    return str(path)


class TestWavRobustness:
    def test_truncated_files_error_not_crash(self, good_wav, tmp_path):
        data = open(good_wav, "rb").read()
        for cut in (3, 11, 20, 43, 100, len(data) - 1):
            p = tmp_path / f"trunc_{cut}.wav"
            p.write_bytes(data[:cut])
            try:
                audio, sr = audio_read(str(p), 0, 4000)
                # short data reads are allowed to zero-pad; they must not
                # fabricate a longer signal than the file holds
                assert audio.shape[0] <= 4000
            except RuntimeError:
                pass  # clean error is the expected outcome

    def test_bitflip_fuzz(self, good_wav, tmp_path):
        rng = np.random.RandomState(1)
        data = bytearray(open(good_wav, "rb").read())
        for trial in range(50):
            corrupted = bytearray(data)
            for _ in range(rng.randint(1, 8)):
                corrupted[rng.randint(0, 64)] ^= 1 << rng.randint(0, 8)
            p = tmp_path / f"fuzz_{trial}.wav"
            p.write_bytes(bytes(corrupted))
            try:
                audio, _ = audio_read(str(p), 0, 1000)
                assert np.isfinite(audio).all()
            except RuntimeError:
                pass

    def test_unsupported_formats_rejected(self, tmp_path):
        # a-law (fmt 6) and 4-bit ADPCM-style headers must be rejected at
        # the header stage, not decoded as PCM garbage / divide by zero
        for fmt, bits in ((6, 8), (7, 8), (2, 4), (1, 4), (3, 16)):
            body = b"\x00" * 64
            fmt_chunk = struct.pack(
                "<HHIIHH", fmt, 1, 16000, 16000 * max(bits // 8, 1),
                max(bits // 8, 1), bits,
            )
            riff = (
                b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_chunk) + 8 + len(body))
                + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
                + b"data" + struct.pack("<I", len(body)) + body
            )
            p = tmp_path / f"fmt{fmt}_{bits}.wav"
            p.write_bytes(riff)
            with pytest.raises(RuntimeError):
                audio_read(str(p), 0, 100)
            with pytest.raises(RuntimeError):
                audio_info(str(p))

    def test_short_fmt_chunk_rejected(self, tmp_path):
        # an 8-byte fmt chunk would leave bits/rate reading stack garbage
        fmt_chunk = struct.pack("<HH", 1, 1) + b"\x00" * 4
        riff = (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", 8) + b"\x00" * 8
        )
        p = tmp_path / "shortfmt.wav"
        p.write_bytes(riff)
        with pytest.raises(RuntimeError):
            audio_read(str(p), 0, 4)

    def test_batch_read_raises_on_missing_file(self, good_wav, tmp_path):
        missing = str(tmp_path / "nope.wav")
        with pytest.raises(RuntimeError, match="failed"):
            wav_read_batch(
                [good_wav, missing], [0, 0], [100, 100], out_len=100
            )

    def test_batch_read_clamps_to_stride(self, good_wav):
        # a frame count larger than the row stride must not overflow the row
        out = wav_read_batch([good_wav], [0], [10_000_000], out_len=64)
        assert out.shape == (1, 64)
        assert np.isfinite(out).all()


class TestFlacRobustness:
    def test_truncated_flac_errors_not_crash(self, tmp_path):
        from test_flac import encode_flac  # local test helper

        pcm = (np.random.RandomState(2).randn(6000) * 3000).astype(np.int16)
        data = encode_flac(pcm)
        from audiodeepfake_detection_tpu.data.wavio import flac_read

        for cut in (4, 8, 20, 40, len(data) // 2):
            p = tmp_path / f"trunc_{cut}.flac"
            p.write_bytes(data[:cut])
            try:
                audio, _ = flac_read(str(p), 0, 1000)
                assert np.isfinite(audio).all()
            except RuntimeError:
                pass

    def test_bitflip_fuzz(self, tmp_path):
        from test_flac import encode_flac

        from audiodeepfake_detection_tpu.data.wavio import flac_read

        pcm = (np.random.RandomState(3).randn(6000) * 3000).astype(np.int16)
        data = bytearray(encode_flac(pcm))
        rng = np.random.RandomState(4)
        for trial in range(50):
            corrupted = bytearray(data)
            for _ in range(rng.randint(1, 6)):
                corrupted[rng.randint(0, len(data))] ^= 1 << rng.randint(0, 8)
            p = tmp_path / f"fuzz_{trial}.flac"
            p.write_bytes(bytes(corrupted))
            try:
                audio, _ = flac_read(str(p), 0, 1000)
                assert np.isfinite(audio).all()
            except RuntimeError:
                pass
