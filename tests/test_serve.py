"""HTTP scoring microservice tests (train/serve.py).

Covers the round-4 verdict's untested surface: micro-batch coalescing,
>batch_size chunking with order preservation, padding correctness vs the
direct ``make_score_fn`` path, aggregate modes, dispatcher fault isolation,
HTTP 400/404/413 handling, /healthz counters, concurrent uploads of real
wav bytes, and ``service_from_snapshot --int8`` calibration.

The unit-level tests use a tiny row-wise model (Dense over the raw frame)
so a 1-core CPU host scores thousands of frames in milliseconds; the
bundled-checkpoint test exercises the full snapshot path and is skipped
when the reference artifacts are absent.
"""

import glob
import json
import threading
import time
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiodeepfake_detection_tpu.train.predict import make_score_fn
from audiodeepfake_detection_tpu.train.serve import ScoringService

SR = 8000
SEC = 0.05
WIN = int(SR * SEC)  # 400 samples/frame


class TinyNet(nn.Module):
    """Row-wise scorer: per-frame result independent of batch padding."""

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(2)(x.reshape(x.shape[0], -1))


def _identity_transform(audio):
    return audio


@pytest.fixture(scope="module")
def service():
    model = TinyNet()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, WIN)), train=False
    )
    svc = ScoringService(
        model,
        _identity_transform,
        variables,
        sample_rate=SR,
        seconds=SEC,
        batch_size=8,
        # generous straggler window: the HTTP coalescing test's 12 handler
        # threads (tempfile write + decode each) share ONE core with the
        # dispatcher — 20 ms arrival spread is routine there and would
        # make the n_dispatches < n_requests assertion flake
        max_wait_ms=150.0,
        warmup=True,
    )
    svc.start()
    yield svc
    svc.stop()


def _direct_scores(svc: ScoringService, frames: np.ndarray) -> np.ndarray:
    """Reference path: the raw jitted scorer, padded exactly like serving."""
    out = np.empty(len(frames), np.float32)
    for s in range(0, len(frames), svc.batch_size):
        chunk = frames[s : s + svc.batch_size]
        batch = np.zeros((svc.batch_size, 1, svc.win), np.float32)
        batch[: len(chunk), 0] = chunk
        res = np.asarray(svc._score(jnp.asarray(batch)))
        out[s : s + len(chunk)] = res[: len(chunk)]
    return out


def _frames(n, seed=0):
    return np.random.RandomState(seed).randn(n, WIN).astype(np.float32)


class TestMicroBatcher:
    def test_scores_match_direct_path(self, service):
        frames = _frames(5, seed=1)
        score, fs = service.submit(frames).result(timeout=30)
        want = _direct_scores(service, frames)
        np.testing.assert_allclose(fs, want, rtol=1e-6)
        assert score == pytest.approx(float(want.mean()), rel=1e-6)

    def test_aggregate_max(self, service):
        frames = _frames(4, seed=2)
        score, fs = service.submit(frames, aggregate="max").result(timeout=30)
        assert score == pytest.approx(float(fs.max()), rel=1e-6)

    def test_chunking_over_batch_size_preserves_order(self, service):
        n = 3 * service.batch_size + 5  # forces 4 padded dispatches
        frames = _frames(n, seed=3)
        d0 = service.n_dispatches
        score, fs = service.submit(frames).result(timeout=60)
        assert len(fs) == n
        np.testing.assert_allclose(fs, _direct_scores(service, frames), rtol=1e-6)
        assert service.n_dispatches - d0 == 4

    def test_microbatch_chunk_scores_equal_whole_batch(self):
        """chunk=N scans the forward inside the dispatch; scores match the
        whole-batch path exactly (the AST b512 VMEM-knee lever,
        docs/benchmarks.md "AST serving batch knee")."""
        model = TinyNet()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, WIN)), train=False
        )
        batch = jnp.asarray(_frames(8, seed=7)[:, None, :])
        whole = make_score_fn(model, _identity_transform, variables)
        chunked = make_score_fn(
            model, _identity_transform, variables, chunk=2
        )
        np.testing.assert_allclose(
            np.asarray(chunked(batch)), np.asarray(whole(batch)), rtol=1e-6
        )
        # non-divisible chunk falls back to the whole batch (no padding
        # surprises), and chunk >= batch is a no-op
        for c in (3, 8, 16):
            fn = make_score_fn(
                model, _identity_transform, variables, chunk=c
            )
            np.testing.assert_allclose(
                np.asarray(fn(batch)), np.asarray(whole(batch)), rtol=1e-6
            )

    def test_auto_chunk_defaults(self):
        """chunk=None resolves to 32 for the AST family, 0 otherwise
        (measured knee, docs/benchmarks.md 'AST serving batch knee')."""
        from audiodeepfake_detection_tpu.models.ast import ASTModel

        model = TinyNet()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, WIN)), train=False
        )
        svc = ScoringService(
            model, _identity_transform, variables,
            sample_rate=SR, seconds=SEC, batch_size=8, warmup=False,
        )
        assert svc.chunk == 0

        ast = ASTModel(model_size="tiny224", input_fdim=64, input_tdim=32)
        avars = ast.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 32)), train=False
        )
        asvc = ScoringService(
            ast,
            lambda audio: jnp.zeros(
                (audio.shape[0], 1, 64, 32), jnp.float32
            ),
            avars,
            sample_rate=SR, seconds=SEC, batch_size=8, warmup=False,
        )
        assert asvc.chunk == 32
        # explicit value always wins
        asvc0 = ScoringService(
            ast, _identity_transform, avars,
            sample_rate=SR, seconds=SEC, batch_size=8, warmup=False,
            chunk=0,
        )
        assert asvc0.chunk == 0

    def test_service_with_chunk_matches_direct(self, service):
        model = TinyNet()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, WIN)), train=False
        )
        svc = ScoringService(
            model,
            _identity_transform,
            variables,
            sample_rate=SR,
            seconds=SEC,
            batch_size=8,
            max_wait_ms=1.0,
            warmup=False,
            chunk=4,
        )
        svc.start()
        try:
            frames = _frames(11, seed=9)
            _, fs = svc.submit(frames).result(timeout=30)
            np.testing.assert_allclose(
                fs, _direct_scores(service, frames), rtol=1e-6
            )
        finally:
            svc.stop()

    def test_concurrent_requests_coalesce(self, service):
        """Many 1-frame clients land in fewer device dispatches, and every
        future resolves to ITS clip's score (order preservation across the
        shared batch)."""
        n_req = 24
        all_frames = [_frames(1, seed=100 + i) for i in range(n_req)]
        d0, s0 = service.n_dispatches, service.n_scored
        start = threading.Barrier(n_req)
        futures = [None] * n_req

        def client(i):
            start.wait()
            futures[i] = service.submit(all_frames[i])

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(n_req)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, fut in enumerate(futures):
            score, fs = fut.result(timeout=60)
            want = _direct_scores(service, all_frames[i])
            np.testing.assert_allclose(fs, want, rtol=1e-6)
        assert service.n_scored - s0 == n_req
        assert service.n_dispatches - d0 < n_req  # coalescing happened

    def test_rejects_empty_frames(self, service):
        with pytest.raises(ValueError, match="no frames"):
            service.submit(np.zeros((0, WIN), np.float32))

    def test_rejects_wrong_width(self, service):
        with pytest.raises(ValueError, match="expected"):
            service.submit(np.zeros((2, WIN + 1), np.float32))

    def test_rejects_bad_aggregate(self, service):
        with pytest.raises(ValueError, match="aggregate"):
            service.submit(_frames(1), aggregate="median")

    def test_submit_before_start_raises(self):
        model = TinyNet()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, WIN)), train=False
        )
        svc = ScoringService(
            model, _identity_transform, variables,
            sample_rate=SR, seconds=SEC, batch_size=4, warmup=False,
        )
        with pytest.raises(RuntimeError, match="not started"):
            svc.submit(_frames(1))

    def test_frame_clip_short_clip_raises(self, service):
        with pytest.raises(ValueError, match="shorter"):
            service.frame_clip(np.zeros(WIN - 1, np.float32), SR)

    def test_frame_clip_rejects_upsampling(self, service):
        with pytest.raises(ValueError, match="no upsampling"):
            service.frame_clip(np.zeros(4 * WIN, np.float32), SR // 2)

    def test_dispatch_error_fails_request_not_daemon(self, service):
        """A failing dispatch resolves the affected futures with the
        exception and the loop keeps serving (round-4 ADVICE medium)."""
        real_score = service._score
        calls = {"n": 0}

        def boom(batch):
            calls["n"] += 1
            raise RuntimeError("transient relay error")

        service._score = boom
        try:
            fut = service.submit(_frames(2, seed=7))
            with pytest.raises(RuntimeError, match="transient relay"):
                fut.result(timeout=30)
        finally:
            service._score = real_score
        assert calls["n"] == 1
        # the dispatcher survived: the next request scores normally
        frames = _frames(3, seed=8)
        _, fs = service.submit(frames).result(timeout=30)
        np.testing.assert_allclose(fs, _direct_scores(service, frames), rtol=1e-6)


def _wav_bytes(samples: np.ndarray, sr: int) -> bytes:
    import io

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        pcm = np.clip(samples * 32767, -32768, 32767).astype("<i2")
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


@pytest.fixture(scope="module")
def http_service(service):
    server = service.make_server("127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield service, f"http://127.0.0.1:{server.server_port}"
    server.shutdown()
    server.server_close()
    thread.join()


class TestHTTP:
    def test_healthz(self, http_service):
        service, url = http_service
        with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
            assert resp.status == 200
            payload = json.loads(resp.read())
        assert payload["status"] == "ok"
        assert payload["model"] == "TinyNet"
        assert payload["batch_size"] == service.batch_size
        assert payload["frame_samples"] == WIN

    def test_score_real_wav_matches_score_clip(self, http_service):
        service, url = http_service
        rng = np.random.RandomState(11)
        audio = np.tanh(rng.randn(3 * WIN).astype(np.float32))
        code, payload = _post(url + "/score", _wav_bytes(audio, SR))
        assert code == 200
        assert payload["frames"] == 3
        assert payload["aggregate"] == "mean"
        # the HTTP path must equal the in-process path ON THE DECODED
        # BYTES (the wav round-trip is int16-quantized, so decode the
        # same container rather than comparing to the float input)
        import os
        import tempfile

        from audiodeepfake_detection_tpu.data.wavio import audio_read

        fd, path = tempfile.mkstemp(suffix=".wav")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(_wav_bytes(audio, SR))
            decoded, rate = audio_read(path)
        finally:
            os.unlink(path)
        want, want_fs = service.score_clip(decoded, rate)
        assert payload["p_fake"] == pytest.approx(want, rel=1e-6)
        np.testing.assert_allclose(payload["frame_scores"], want_fs, rtol=1e-5)

    def test_aggregate_query_param(self, http_service):
        _, url = http_service
        audio = np.tanh(np.random.RandomState(12).randn(2 * WIN)).astype(
            np.float32
        )
        body = _wav_bytes(audio, SR)
        _, mean_p = _post(url + "/score?aggregate=mean", body)
        _, max_p = _post(url + "/score?aggregate=max", body)
        assert max_p["p_fake"] == pytest.approx(
            max(max_p["frame_scores"]), rel=1e-6
        )
        assert mean_p["p_fake"] == pytest.approx(
            float(np.mean(mean_p["frame_scores"])), rel=1e-6
        )

    def test_concurrent_uploads_coalesce_and_stay_separate(self, http_service):
        service, url = http_service
        rng = np.random.RandomState(13)
        clips = [np.tanh(rng.randn(WIN).astype(np.float32)) for _ in range(12)]
        d0 = service.n_dispatches
        results = [None] * len(clips)

        def client(i):
            results[i] = _post(url + "/score", _wav_bytes(clips[i], SR))

        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(len(clips))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        scores = set()
        for code, payload in results:
            assert code == 200
            assert payload["frames"] == 1
            scores.add(round(payload["p_fake"], 9))
        assert len(scores) == len(clips)  # every client got ITS score
        assert service.n_dispatches - d0 < len(clips)

    def test_garbage_body_is_400(self, http_service):
        _, url = http_service
        code, payload = _post(url + "/score", b"\x00\x01notaudio" * 16)
        assert code == 400
        assert "unrecognized" in payload["error"]

    def test_corrupt_wav_is_400(self, http_service):
        _, url = http_service
        code, payload = _post(url + "/score", b"RIFF\x00\x00\x00\x00junk")
        assert code == 400
        assert "undecodable" in payload["error"]

    def test_short_clip_is_400(self, http_service):
        _, url = http_service
        code, payload = _post(
            url + "/score", _wav_bytes(np.zeros(WIN // 2, np.float32), SR)
        )
        assert code == 400
        assert "shorter" in payload["error"]

    def test_empty_body_is_400(self, http_service):
        _, url = http_service
        code, payload = _post(url + "/score", b"")
        assert code == 400

    def test_unknown_path_is_404(self, http_service):
        _, url = http_service
        code, _ = _post(url + "/nope", b"x")
        assert code == 404
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(url + "/metrics", timeout=30)
        assert err.value.code == 404

    def test_oversized_body_is_413(self, http_service):
        service, url = http_service
        old = service.max_body_bytes
        service.max_body_bytes = 1024
        try:
            code, payload = _post(
                url + "/score", _wav_bytes(np.zeros(4 * WIN, np.float32), SR)
            )
        finally:
            service.max_body_bytes = old
        assert code == 413
        assert "too large" in payload["error"]


class TestPcm16Wire:
    """pcm16 mode ships int16 frames and converts in-graph: bit-exact for
    16-bit wav sources, halved wire bytes."""

    @pytest.fixture(scope="class")
    def pcm_service(self):
        model = TinyNet()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, WIN)), train=False
        )
        svc = ScoringService(
            model, _identity_transform, variables,
            sample_rate=SR, seconds=SEC, batch_size=8,
            max_wait_ms=5.0, warmup=True, pcm16=True,
        )
        svc.start()
        yield svc
        svc.stop()

    def test_wav_scores_bit_exact_vs_float_service(self, service, pcm_service):
        """A 16-bit wav decodes to pcm/32768; the pcm16 wire re-rounds to
        the SAME ints, so scores equal the float32 service exactly."""
        rng = np.random.RandomState(21)
        pcm = rng.randint(-32768, 32768, size=3 * WIN).astype(np.int16)
        audio = pcm.astype(np.float32) / 32768.0  # what wav decode yields
        s_f, fs_f = service.score_clip(audio, SR)
        s_p, fs_p = pcm_service.score_clip(audio, SR)
        assert s_p == s_f
        np.testing.assert_array_equal(fs_p, fs_f)

    def test_submit_accepts_int16_directly(self, pcm_service):
        rng = np.random.RandomState(22)
        pcm = rng.randint(-2000, 2000, size=(2, WIN)).astype(np.int16)
        score, fs = pcm_service.submit(pcm).result(timeout=30)
        want, want_fs = pcm_service.submit(
            pcm.astype(np.float32) / 32768.0
        ).result(timeout=30)
        assert score == want
        np.testing.assert_array_equal(fs, want_fs)

    def test_frame_clip_emits_int16(self, pcm_service):
        frames = pcm_service.frame_clip(
            np.zeros(2 * WIN, np.float32), SR
        )
        assert frames.dtype == np.int16
        assert frames.nbytes * 2 == 2 * WIN * 4  # half the float32 bytes

    def test_healthz_reports_pcm16(self, pcm_service):
        server = pcm_service.make_server("127.0.0.1", 0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            url = f"http://127.0.0.1:{server.server_port}/healthz"
            with urllib.request.urlopen(url, timeout=30) as resp:
                payload = json.loads(resp.read())
            assert payload["pcm16"] is True
        finally:
            server.shutdown()
            server.server_close()
            thread.join()


SNAP = "/root/reference/models"
SAMPLES = "/root/reference/audio-samples/classification_examples"


class TestServiceFromSnapshot:
    def test_int8_snapshot_service_end_to_end(self):
        """``service_from_snapshot --int8 --calibrate`` builds a working
        quantized service whose HTTP scores rank the real clip below the
        GAN clip (the serving analogue of TestBundledCheckpointInt8)."""
        snaps = glob.glob(f"{SNAP}/model_packetssym5_*.pt")
        real = sorted(glob.glob("/root/reference/tests/data/real/*.wav"))
        fake = sorted(glob.glob(f"{SAMPLES}/[BD]_*.wav"))[:1]
        if not snaps or not real or not fake:
            pytest.skip("bundled reference artifacts unavailable")
        from audiodeepfake_detection_tpu.train.predict import (
            estimate_norm_stats,
        )
        from audiodeepfake_detection_tpu.train.serve import (
            service_from_snapshot,
        )

        # the bundled checkpoints ship no training-corpus stats: estimate
        # from the clip set, exactly like the discrimination tests do
        mean, std = estimate_norm_stats(
            snaps[0], [real[0], fake[0]], use_pallas=False
        )
        svc = service_from_snapshot(
            snaps[0],
            mean=np.asarray(mean).ravel().tolist(),
            std=np.asarray(std).ravel().tolist(),
            batch_size=4,  # tiny warmup: 1-core CPU host
            int8=True,
            calibrate=[real[0], fake[0]],
            use_pallas=False,
            output="margin",
        )
        server = svc.make_server("127.0.0.1", 0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        with svc:
            thread.start()
            url = f"http://127.0.0.1:{server.server_port}"
            try:
                scores = {}
                for path in (real[0], fake[0]):
                    with open(path, "rb") as fh:
                        code, payload = _post(url + "/score", fh.read())
                    assert code == 200, payload
                    scores[path] = payload["p_fake"]
            finally:
                server.shutdown()
                server.server_close()
                thread.join()
        # int8 + self-estimated norm: margins keep the sign structure
        assert scores[real[0]] < 0.0, scores
        assert scores[fake[0]] > 0.0, scores
