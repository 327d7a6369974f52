"""Analysis CLI smoke tests (figure generation, fingerprints)."""

import os
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    sr = 8000
    t = np.arange(2 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    path = d / "tone.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return str(path)


class TestAnalysisCLI:
    def test_spectrogram_command(self, wav_file, tmp_path):
        from audiodeepfake_detection_tpu.analysis.cli import main

        out = str(tmp_path / "spec")
        main(["spectrogram", wav_file, "--out", out, "--n-fft", "256", "--hop", "128"])
        assert os.path.exists(out + ".jpg")

    def test_scalogram_command(self, wav_file, tmp_path):
        from audiodeepfake_detection_tpu.analysis.cli import main

        out = str(tmp_path / "scal")
        main(
            [
                "scalogram", wav_file, "--out", out,
                "--num-scales", "32", "--num-frames", "4000",
            ]
        )
        assert os.path.exists(out + ".jpg")

    def test_energy_command(self, wav_file, tmp_path):
        from audiodeepfake_detection_tpu.analysis.cli import main

        out = str(tmp_path / "stats")
        main(["energy", "--data-dir", os.path.dirname(wav_file), "--out", out])
        assert os.path.exists(out + "_energy.npy")
        assert os.path.exists(out + "_pitch.npy")
        # corpus-wide format: one (mean, std) row per clip
        pitch = np.load(out + "_pitch.npy")
        assert pitch.shape == (1, 2)
        assert abs(pitch[0, 0] - 440.0) < 10
        cent = np.load(out + "_centroid.npy")
        assert cent.shape == (1,)

    def test_fingerprints_command(self, tmp_path, wav_file):
        from audiodeepfake_detection_tpu.analysis.cli import main

        root = tmp_path / "corpus"
        for d in ("A_real", "B_gen"):
            (root / d).mkdir(parents=True)
            for i in range(2):
                sr = 8000
                rng = np.random.RandomState(i)
                x = (rng.randn(3 * sr) * 3000).astype("<i2")
                with wave.open(str(root / d / f"c{i}.wav"), "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(x.tobytes())
        out = str(tmp_path / "fp")
        main(
            [
                "fingerprints", "--data-path", str(root),
                "--generators", "gen", "--real-name", "real",
                "--level", "8", "--out-dir", out,
            ]
        )
        assert os.path.exists(os.path.join(out, "gen_wpt_diff.npy"))
        assert os.path.exists(os.path.join(out, "gen_fingerprint.wav"))
