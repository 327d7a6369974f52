"""Host input-pipeline benchmark: native decode vs pre-decoded frame cache.

Builds a synthetic wav corpus, then measures sustained FrameLoader
throughput (frames/s) three ways: threaded native decode, frame-cache
build cost, and warm frame-cache serving.  Run on the training host to
check the loader outruns the device step rate (docs/benchmarks.md).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiodeepfake_detection_tpu.data.dataset import CustomDataset
from audiodeepfake_detection_tpu.data.frame_cache import build_frame_cache
from audiodeepfake_detection_tpu.data.loader import FrameLoader


def build_corpus(root: str, n_files: int, secs_per_file: int, sr: int) -> str:
    d = os.path.join(root, "A_real")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n_files):
        pcm = (rng.randn(secs_per_file * sr) * 6000).astype("<i2")
        with wave.open(os.path.join(d, f"clip{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
    return d


def sweep(loader: FrameLoader, epochs: int) -> float:
    n = 0
    t0 = time.perf_counter()
    for e in range(epochs):
        for batch in loader.epoch(e):
            n += int(batch["weight"].sum())
    return n / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=60)
    ap.add_argument("--secs", type=int, default=30)
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="bench_loader_")
    try:
        d = build_corpus(root, args.files, args.secs, args.sr)
        ds = CustomDataset(
            paths=[d], labels=[0], save_path=root, ds_type="test",
            train_ratio=0.0, val_ratio=0.0, resample_rate=args.sr, seconds=1,
        )
        print(f"corpus: {len(ds)} one-second frames")

        direct = FrameLoader(
            ds, args.batch, num_threads=args.threads, use_frame_cache=False
        )
        sweep(direct, 1)  # warm page cache
        fps_decode = sweep(direct, args.epochs)
        print(f"native decode:     {fps_decode:8.0f} frames/s")

        t0 = time.perf_counter()
        build_frame_cache(ds, num_threads=args.threads)
        t_build = time.perf_counter() - t0
        print(f"cache build:       {len(ds) / t_build:8.0f} frames/s (one-off)")

        cached = FrameLoader(ds, args.batch, num_threads=args.threads)
        assert cached._frame_cache is not None
        sweep(cached, 1)
        fps_cache = sweep(cached, args.epochs)
        print(f"warm frame cache:  {fps_cache:8.0f} frames/s (float32)")

        pcm = FrameLoader(ds, args.batch, num_threads=args.threads, emit="int16")
        sweep(pcm, 1)
        fps_pcm = sweep(pcm, args.epochs)
        print(f"warm cache int16:  {fps_pcm:8.0f} frames/s (PCM to device)")
        print(
            f"speedup vs decode: {fps_cache / fps_decode:.1f}x (float32), "
            f"{fps_pcm / fps_decode:.1f}x (int16)"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
