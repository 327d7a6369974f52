"""Pre-decoded frame cache: correctness + loader equivalence."""

import os
import wave

import numpy as np
import pytest

from audiodeepfake_detection_tpu.data.dataset import CustomDataset
from audiodeepfake_detection_tpu.data.frame_cache import (
    build_frame_cache,
    decode_frames,
    open_frame_cache,
)
from audiodeepfake_detection_tpu.data.loader import FrameLoader


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("fc")
    d = root / "A_real"
    d.mkdir()
    rng = np.random.RandomState(0)
    sr = 2000
    for i in range(3):
        pcm = (rng.randn(6 * sr) * 8000).astype("<i2")
        with wave.open(str(d / f"c{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
    return CustomDataset(
        paths=[str(d)],
        labels=[0],
        save_path=str(root),
        ds_type="test",
        train_ratio=0.0,
        val_ratio=0.0,
        resample_rate=sr,
        seconds=1,
    )


class TestFrameCache:
    def test_build_and_exact_roundtrip(self, dataset):
        path = build_frame_cache(dataset, num_threads=2, batch_size=4)
        assert os.path.exists(path)
        cache = open_frame_cache(dataset)
        assert cache is not None
        assert cache.shape == (len(dataset), 2000)
        # 16-bit PCM sources round-trip exactly through the int16 cache
        raw_loader = FrameLoader(
            dataset, len(dataset), prefetch=0, use_frame_cache=False
        )
        raw = next(iter(raw_loader.epoch(0)))["audio"][:, 0, :]
        np.testing.assert_array_equal(
            decode_frames(cache, np.arange(len(dataset))), raw
        )

    def test_loader_cache_matches_decode(self, dataset):
        build_frame_cache(dataset)
        cached = FrameLoader(dataset, 4, seed=3, shuffle=True)
        assert cached._frame_cache is not None
        direct = FrameLoader(
            dataset, 4, seed=3, shuffle=True, use_frame_cache=False
        )
        for b_c, b_d in zip(cached.epoch(1), direct.epoch(1)):
            np.testing.assert_array_equal(b_c["audio"], b_d["audio"])
            np.testing.assert_array_equal(b_c["label"], b_d["label"])
            np.testing.assert_array_equal(b_c["weight"], b_d["weight"])

    def test_stale_cache_rejected(self, dataset, tmp_path):
        from audiodeepfake_detection_tpu.data.frame_cache import (
            frame_cache_path,
        )

        path = build_frame_cache(dataset)
        # corrupt: wrong shape
        np.save(path, np.zeros((2, 5), np.int16))
        assert open_frame_cache(dataset) is None
        # rebuild repairs it
        build_frame_cache(dataset)
        assert open_frame_cache(dataset) is not None
        assert frame_cache_path(dataset) == path

    def test_cache_is_faster_than_decode(self, dataset):
        import time

        build_frame_cache(dataset)
        cached = FrameLoader(dataset, 8, prefetch=0)
        direct = FrameLoader(dataset, 8, prefetch=0, use_frame_cache=False)
        for loader in (cached, direct):  # warm OS caches
            list(loader.epoch(0))
        t0 = time.perf_counter()
        # best-of-3 five-epoch timings: both paths run in microseconds on
        # this tiny corpus, so a single scheduler preemption would flip a
        # one-shot comparison on a shared CI runner
        def best_of_3(loader):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    list(loader.epoch(0))
                best = min(best, time.perf_counter() - t0)
            return best

        t_cache = best_of_3(cached)
        t_decode = best_of_3(direct)
        # The 1.5x tolerance is deliberate headroom for noisy shared CI
        # runners: on this microsecond-scale corpus the cache's real win
        # (66k vs 11k frames/s on the bench corpus, tools/bench_loader.py)
        # is swamped by per-epoch fixed costs, so the guard only catches a
        # cache path that is grossly slower than direct decode.
        assert t_cache < t_decode * 1.5
