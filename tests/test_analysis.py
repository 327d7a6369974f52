"""Analysis subsystem tests: integrated gradients, fingerprints, stats, CWT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodeepfake_detection_tpu.analysis.integrated_gradients import (
    Mean,
    integral_approximation,
    integrated_grad,
    interpolate_images,
)


class TestIntegratedGradients:
    def test_interpolation_endpoints(self):
        baseline = jnp.zeros((1, 4, 4))
        image = jnp.ones((1, 4, 4)) * 2.0
        alphas = jnp.asarray([0.0, 0.5, 1.0])
        path = np.asarray(interpolate_images(baseline, image, alphas))
        np.testing.assert_allclose(path[0], 0.0)
        np.testing.assert_allclose(path[1], 1.0)
        np.testing.assert_allclose(path[2], 2.0)

    def test_trapezoid_of_constant(self):
        g = jnp.ones((11, 3, 3))
        np.testing.assert_allclose(np.asarray(integral_approximation(g)), 1.0)

    def test_completeness_axiom(self):
        """sum(IG) ~= F(image) - F(baseline) for the softmax target prob."""
        from audiodeepfake_detection_tpu.models import Regression

        model = Regression()
        x = np.random.RandomState(0).randn(1, 1, 8, 8).astype(np.float32)
        variables = model.init(jax.random.key(0), x)

        def apply_fn(v, img, train=False):
            return model.apply(v, img)

        image = jnp.asarray(x[0])
        target = jnp.asarray(1)
        ig = integrated_grad(apply_fn, variables, image, target, m_steps=200)

        def prob(img):
            logits = apply_fn(variables, img[None])[0]
            return jax.nn.softmax(logits)[1]

        want = float(prob(image) - prob(jnp.zeros_like(image)))
        got = float(jnp.sum(ig))
        assert abs(got - want) < 5e-3

    def test_mean_accumulator(self):
        m = Mean()
        m.update(np.full((1, 2, 2), 2.0))
        m.update(np.full((1, 2, 2), 4.0))
        np.testing.assert_allclose(m.finalize(), 3.0)

    def test_mean_accumulator_reference_shape_contract(self):
        """finalize = axis-0 mean / count: the reference feeds [1, ...]
        singleton batches (train_classifier.py:694-844), for which this is
        the per-sample mean with the leading axis squeezed away."""
        rng = np.random.RandomState(3)
        samples = rng.randn(5, 1, 4, 6).astype(np.float32)
        m = Mean()
        for s in samples:
            m.update(s)
        np.testing.assert_allclose(
            m.finalize(), samples.mean(axis=0)[0], rtol=1e-6
        )


class TestFingerprints:
    def test_mean_spectra_separate_tone_from_noise(self):
        from audiodeepfake_detection_tpu.analysis.fingerprints import (
            mean_rfft_spectrum,
            mean_wpt_spectrum,
        )

        rng = np.random.RandomState(0)
        sr = 4096
        t = np.arange(4 * sr) / sr
        tone = [np.sin(2 * np.pi * 440 * t).astype(np.float32)]
        noise = [rng.randn(4 * sr).astype(np.float32)]
        level = 6
        tone_spec = mean_wpt_spectrum(tone, "haar", level)
        noise_spec = mean_wpt_spectrum(noise, "haar", level)
        # the tone's energy concentrates in one band (haar leaks somewhat);
        # noise is flat
        assert tone_spec.max() / tone_spec.mean() > 4
        assert noise_spec.max() / noise_spec.mean() < 2
        fft_tone = mean_rfft_spectrum(tone, n=4096)
        assert np.argmax(fft_tone) == 440

    def test_fingerprint_audio_roundtrip(self):
        from audiodeepfake_detection_tpu.analysis.fingerprints import (
            fingerprint_audio,
        )

        spec = np.zeros(2**13 + 1)
        spec[100] = 1.0
        audio = fingerprint_audio(spec, n=2**14)
        assert audio.shape == (2**14,)
        # single bin -> a pure cosine
        f = np.abs(np.fft.rfft(audio))
        assert np.argmax(f) == 100


class TestStats:
    def test_yin_tracks_sine(self):
        from audiodeepfake_detection_tpu.analysis.stats import yin_pitch

        sr = 22050
        t = np.arange(2 * sr) / sr
        clip = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
        pitch = yin_pitch(clip, sr)
        assert abs(np.median(pitch) - 220.0) < 3.0

    def test_spectral_centroid_of_tone(self):
        from audiodeepfake_detection_tpu.analysis.stats import spectral_centroid

        sr = 22050
        t = np.arange(sr) / sr
        clip = np.sin(2 * np.pi * 3000.0 * t).astype(np.float32)
        cent = spectral_centroid(clip, sr)
        assert abs(np.median(cent) - 3000.0) < 150.0

    def test_corpus_stats_aggregates_every_clip(self):
        """corpus_stats must be per-clip over the WHOLE corpus (reference
        avg_energy_stft aggregation), not clips[0] only: two clips with
        distinct tones must yield two distinct centroid/pitch rows."""
        from audiodeepfake_detection_tpu.analysis.stats import corpus_stats

        sr = 22050
        t = np.arange(sr) / sr
        clip_a = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
        clip_b = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        out = corpus_stats([clip_a, clip_b], [sr, sr])
        assert out["centroids"].shape == (2,)
        assert out["pitch_means"].shape == (2,)
        assert abs(out["pitch_means"][0] - 220.0) < 5.0
        assert abs(out["pitch_means"][1] - 440.0) < 5.0
        assert out["centroids"][1] > out["centroids"][0]
        assert abs(
            out["pitch_mean"] - out["pitch_means"].mean()
        ) < 1e-9


class TestCWT:
    def test_batched_matches_reference_loop(self):
        """The shared-FFT batched device path must match the per-scale
        float64 numpy oracle (pywt's own loop structure) to fp32 accuracy."""
        from audiodeepfake_detection_tpu.ops.cwt import cwt, cwt_reference

        rng = np.random.RandomState(0)
        clip = rng.randn(1500)
        scales = np.linspace(2.0, 60.0, 17)
        got, freqs = cwt(clip, scales, "shan0.3-1.0", sampling_period=0.5)
        want, freqs_ref = cwt_reference(
            clip, scales, "shan0.3-1.0", sampling_period=0.5
        )
        assert got.shape == want.shape == (17, 1500)
        np.testing.assert_allclose(freqs, freqs_ref)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)

    def test_tone_localizes_at_scale(self):
        from audiodeepfake_detection_tpu.ops.cwt import cwt, scale2frequency

        sr = 8192
        t = np.arange(sr) / sr
        clip = np.sin(2 * np.pi * 500.0 * t)
        freqs_wanted = np.linspace(2000, 100, 40)
        fc = scale2frequency("shan0.3-1.0", np.ones(1))[0]
        scales = fc * sr / freqs_wanted
        coef, freqs = cwt(clip, scales, "shan0.3-1.0", sampling_period=1.0 / sr)
        power = np.abs(coef).mean(-1)
        peak_freq = freqs[int(np.argmax(power))]
        assert abs(peak_freq - 500.0) < 100.0


class TestModelDiffs:
    def _dump(self, tmp_path, name, known, unknown, wav_path):
        table = np.array(
            [[str(wav_path), 0, 256, 0]] * 4, dtype=object
        )
        cross = np.array([[str(wav_path), 0, 256, 1]] * 4, dtype=object)
        out = tmp_path / f"true_ind_{name}.npy"
        np.save(
            out,
            {
                "known": np.asarray(known),
                "unknown": np.asarray(unknown),
                "dataset": cross,
                "dataset_known": table,
            },
        )
        return str(out)

    def test_known_key_uses_known_table(self, tmp_path):
        """Regression: the reference misfiles known indices against the
        cross table; our dumps carry "dataset_known" and the exporter must
        use it for key="known"."""
        import wave

        from audiodeepfake_detection_tpu.analysis.model_diffs import (
            export_diff_audio,
        )

        wav = tmp_path / "clip.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(
                (np.sin(np.arange(1024) * 0.1) * 20000).astype("<i2").tobytes()
            )
        a = self._dump(tmp_path, "a", known=[0, 1, 3], unknown=[2], wav_path=wav)
        b = self._dump(tmp_path, "b", known=[1], unknown=[2], wav_path=wav)
        out_dir = tmp_path / "diffs"
        diff = export_diff_audio(a, b, str(out_dir), key="known")
        np.testing.assert_array_equal(diff, [0, 3])
        files = sorted(p.name for p in out_dir.glob("*.wav"))
        # label column comes from dataset_known (label 0), not the cross
        # table (label 1)
        assert files == ["diff_0_label0_idx0.wav", "diff_1_label0_idx3.wav"]
