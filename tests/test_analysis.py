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


class TestCWT:
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
