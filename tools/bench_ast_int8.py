"""AST int8 serving A/B: bf16 vs on-the-fly int8 vs baked int8 weights.

Round-5 measurement for the baked-weight path (ops/quantize.py
``bake_int8_weights``): the round-4 int8 numbers quantized the fp32
masters inside every dispatch, so the executable still read full-precision
weights from HBM; baking stores int8 kernels + per-channel scales in the
variables and the forward reads ~86.6 MB of weights instead of ~346 MB.

Protocol (CLAUDE.md): scan-chained K forwards per dispatch with a real
data dependence, timed region ends with a VALUE fetch (the relay's
block_until_ready can return early); median of >=3 windows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_forward(model, variables, img, steps, windows, chunk=0):
    import jax
    import jax.numpy as jnp

    # SEPARATE dispatches chained by a data dependence (bench.py
    # protocol), NOT a lax.scan: inside a scan XLA hoists the
    # loop-invariant weight-requantization out of the loop, which would
    # amortize exactly the per-dispatch cost this A/B exists to measure
    # (serving issues one dispatch per request batch).  Variables are an
    # ARGUMENT, not a closure: closed-over trees become HLO constants and
    # a 346 MB weight-embedded program exceeds the relay's
    # compile-request body limit (observed HTTP 413).
    #
    # ``chunk``: scan the forward over microbatches of that size INSIDE
    # the dispatch (the serving analogue of grad-accum: one dispatch per
    # request batch, but each microbatch re-enters the small-batch VMEM
    # residency regime).  Scanning is legitimate here — a real serving
    # dispatch would run the same scan — and the baked-int8 path has no
    # per-dispatch requantization for the scan to hoist.
    def fwd(v, x):
        if chunk and chunk < x.shape[0]:
            groups = x.reshape((x.shape[0] // chunk, chunk) + x.shape[1:])
            return jax.lax.map(
                lambda g: model.apply(v, g, train=False), groups
            ).reshape((x.shape[0], -1))
        return model.apply(v, x, train=False)

    @jax.jit
    def one(v, x):
        out = fwd(v, x)
        dep = (1e-30 * jnp.mean(out)).astype(x.dtype)
        return x + dep, jnp.mean(out)

    dvars = jax.device_put(variables)
    x, m = one(dvars, img)
    float(m)  # compile + warm
    times = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(steps):
            x, m = one(dvars, x)
        float(m)  # fetch-at-end timing barrier
        times.append((time.time() - t0) / steps)
    cost = {}
    try:
        ca = one.lower(dvars, img).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] or {}
        cost["bytes"] = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass
    return float(np.median(times)), times, cost


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument(
        "--chunk", type=int, default=0,
        help="scan the forward over microbatches of this size inside "
        "each dispatch (0 = whole batch at once)",
    )
    ap.add_argument("--size", default="base384")
    ap.add_argument(
        "--modes", nargs="+", default=["bf16", "int8", "int8-baked"],
        choices=["bf16", "int8", "int8-baked"],
    )
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from audiodeepfake_detection_tpu.models.ast import ASTModel
    from audiodeepfake_detection_tpu.ops.quantize import (
        bake_int8_weights,
        quantize_model,
    )

    model = ASTModel(
        model_size=args.size,
        dtype=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(args.batch, 1, 256, 101).astype(np.float32))
    variables = model.init(jax.random.key(0), img, train=False)

    qmodel = qvars = None
    if any(m.startswith("int8") for m in args.modes):
        qmodel, _ = quantize_model(model, variables, [img[:2]])
    for mode in args.modes:
        if mode == "bf16":
            m, v = model, variables
        elif mode == "int8":
            m, v = qmodel, variables
        else:
            if qvars is None:
                qvars = bake_int8_weights(qmodel, variables, img[:2])
            m, v = qmodel, qvars
        step_s, times, cost = timed_forward(
            m, v, img, args.steps, args.windows, chunk=args.chunk
        )
        fps = args.batch / step_s
        extra = (
            f", cost-model {cost['bytes'] / 1e9:.2f} GB/fwd"
            if cost.get("bytes")
            else ""
        )
        tag = f" chunk{args.chunk}" if args.chunk else ""
        print(
            f"AST {args.size} forward b{args.batch}{tag} [{mode}]: "
            f"{step_s * 1e3:.2f} ms median "
            f"({', '.join(f'{t * 1e3:.2f}' for t in times)}), "
            f"{fps:.0f} frames/s/chip{extra}"
        )


if __name__ == "__main__":
    main()
