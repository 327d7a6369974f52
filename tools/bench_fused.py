#!/usr/bin/env python
"""Kernel-iteration benchmark: DCNN train step with/without fused layer 1.

Measures the headline configuration (packets-sym5 level-8 + DCNN, batch 128,
bf16 speed mode) with ``fused_layer1`` off (XLA baseline) and on (Pallas
kernel, ops/fused_conv1.py).  Used for the round-2+ fused-kernel iteration
series recorded in docs/benchmarks.md.
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)  # so `import bench_matrix` also works via -m

from bench_matrix import bench_step  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--only", choices=["fused", "xla"], default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from audiodeepfake_detection_tpu.models import DCNN
    from audiodeepfake_detection_tpu.ops.wpt import packet_image

    def transform(audio):
        # Match bench.py's speed mode: DEFAULT = one bf16 MXU pass in the
        # WPT's banded dots (default is the HIGHEST multi-pass parity
        # kernel, which would inflate both timed configurations equally).
        return packet_image(
            audio, "sym5", level=8, log_scale=True, power=2.0,
            precision=jax.lax.Precision.DEFAULT,
        )

    fast = dict(precision=jax.lax.Precision.DEFAULT, dtype=jnp.bfloat16)
    if args.only != "fused":
        bench_step(
            DCNN(time_dim=12, **fast), transform,
            "packets-sym5 + DCNN bf16 (XLA layer 1)", steps=args.steps,
        )
    if args.only != "xla":
        bench_step(
            DCNN(time_dim=12, fused_layer1=True, **fast), transform,
            "packets-sym5 + DCNN bf16 (fused Pallas layer 1)",
            steps=args.steps,
        )


if __name__ == "__main__":
    main()
