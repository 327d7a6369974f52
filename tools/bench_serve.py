"""Scoring-service throughput on the local chip (frames/s through
ScoringService.submit, the micro-batching serving path).

Measures the REAL serving pipeline — host framing, padded H2D per chunk,
jitted scorer dispatches (pipelined: all chunks enqueued before any
fetch), future resolution — for the bundled sym5 DCNN checkpoint, fp32
vs int8-baked.  Median of >=3 windows, one large request per window.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAP = "/root/reference/models"
CLIPS = [
    "/root/reference/tests/data/real/LJ008-0217.wav",
    "/root/reference/tests/data/ljspeech_melgan/LJ008-0217_gen.wav",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument(
        "--modes", nargs="+", default=["fp32", "int8"],
        choices=["fp32", "int8", "fp32-pcm16", "int8-pcm16"],
    )
    ap.add_argument(
        "--chunk", type=int, default=0,
        help="scan the model forward over microbatches of this size "
        "inside each dispatch (the AST large-batch knee lever)",
    )
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from audiodeepfake_detection_tpu.train.predict import estimate_norm_stats
    from audiodeepfake_detection_tpu.train.serve import service_from_snapshot

    snap = glob.glob(f"{SNAP}/model_packetssym5_*.pt")[0]
    mean, std = estimate_norm_stats(snap, CLIPS)
    rng = np.random.RandomState(0)

    for mode in args.modes:
        int8 = mode.startswith("int8")
        svc = service_from_snapshot(
            snap,
            mean=np.asarray(mean).ravel().tolist(),
            std=np.asarray(std).ravel().tolist(),
            batch_size=args.batch_size,
            int8=int8,
            calibrate=CLIPS if int8 else (),
            pcm16=mode.endswith("pcm16"),
            chunk=args.chunk,
        )
        frames = np.tanh(
            rng.randn(args.frames, svc.win).astype(np.float32)
        )
        with svc:
            svc.score_clip(  # warm: exercises the full submit path
                frames[0], svc.sample_rate
            )
            times = []
            for _ in range(args.windows):
                t0 = time.time()
                score, fs = svc.submit(frames).result()
                times.append(time.time() - t0)
                assert len(fs) == args.frames
            med = float(np.median(times))
        print(
            f"service [{mode}] b{args.batch_size}, {args.frames}-frame "
            f"request: {med * 1e3:.0f} ms median "
            f"({', '.join(f'{t * 1e3:.0f}' for t in times)}), "
            f"{args.frames / med:.0f} frames/s, "
            f"{svc.n_dispatches} dispatches total"
        )


if __name__ == "__main__":
    main()
