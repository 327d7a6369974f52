#!/usr/bin/env python
"""Capture a jax.profiler trace of the fused train step and print a per-op
duration breakdown (parsed from the perfetto trace, no TensorBoard needed).

Usage: python tools/profile_step.py [--steps 20] [--out /tmp/jax_trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_trace(out_dir: str, steps: int, fused: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from audiodeepfake_detection_tpu.models import DCNN
    from audiodeepfake_detection_tpu.ops.wpt import packet_image
    from audiodeepfake_detection_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = DCNN(
        time_dim=12, precision=jax.lax.Precision.DEFAULT, dtype=jnp.bfloat16,
        fused_layer1=fused,
    )

    def transform(audio):
        return packet_image(audio, "sym5", level=8, log_scale=True, power=2.0)

    tx = make_optimizer(4e-4, 1e-3)
    rng = np.random.RandomState(0)
    batch = {
        "audio": rng.randn(128, 1, 22050).astype(np.float32),
        "label": rng.randint(0, 2, 128).astype(np.int32),
    }
    img = transform(jnp.asarray(batch["audio"][:16]))
    state = create_train_state(model, tx, img, seed=0)
    step = make_train_step(model, transform, tx)
    dbatch = jax.device_put(batch)
    state, stats = step(state, dbatch)
    float(stats["loss"])
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, stats = step(state, dbatch)
    float(stats["loss"])
    jax.profiler.stop_trace()


def summarize(out_dir: str, top: int = 25) -> None:
    traces = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not traces:
        print("no trace files found under", out_dir)
        return
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)
    durations = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
        # keep only device-lane events (XLA ops); heuristic: skip python/host
        cat = str(ev.get("cat", ""))
        if "TSL" in cat or name.startswith(("$", "process_")):
            continue
        durations[name] += dur
        counts[name] += 1
        total += dur
    print(f"top {top} ops by accumulated duration (us) — total {total:.0f}")
    for name, dur in sorted(durations.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur:12.0f}  x{counts[name]:<5d}  {name[:110]}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--out", default="/tmp/jax_trace")
    parser.add_argument("--summarize-only", action="store_true")
    parser.add_argument("--fused", action="store_true")
    args = parser.parse_args()
    if not args.summarize_only:
        run_and_trace(args.out, args.steps, fused=args.fused)
    summarize(args.out)
