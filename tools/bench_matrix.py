#!/usr/bin/env python
"""Benchmark matrix: several model/transform configurations on the TPU.

Prints one line per configuration (ms/step, frames/s).  Used to fill
docs/benchmarks.md; `bench.py` remains the driver's single-line benchmark.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 128
T = 22050


def headline_setup(fused: bool = True, batch: int = B, fused2: bool = False):
    """Shared harness for the headline configuration (packets-sym5 + DCNN,
    bf16 speed mode): returns (model, transform, host_batch, state, step).
    Used by bench_matrix/profile_step/dump_hlo so the config lives once."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from audiodeepfake_detection_tpu.models import DCNN
    from audiodeepfake_detection_tpu.ops.wpt import packet_image
    from audiodeepfake_detection_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = DCNN(
        time_dim=12,
        precision=jax.lax.Precision.DEFAULT,
        dtype=jnp.bfloat16,
        fused_layer1=fused,
        fused_layer2=fused2,
    )

    def transform(audio):
        # Match bench.py's speed mode: DEFAULT = one bf16 MXU pass in the
        # WPT's banded dots. Without this the profile shows the HIGHEST
        # (multi-pass fp32) parity kernel at ~0.7 ms/step instead of the
        # configuration the headline number actually runs.
        return packet_image(
            audio, "sym5", level=8, log_scale=True, power=2.0,
            precision=jax.lax.Precision.DEFAULT,
        )

    tx = make_optimizer(4e-4, 1e-3)
    rng = np.random.RandomState(0)
    host_batch = {
        "audio": rng.randn(batch, 1, T).astype(np.float32),
        "label": rng.randint(0, 2, batch).astype(np.int32),
    }
    img = transform(jnp.asarray(host_batch["audio"][:16]))
    state = create_train_state(model, tx, img, seed=0)
    step = make_train_step(model, transform, tx)
    return model, transform, host_batch, state, step


def bench_step(model, transform, tag, steps=50):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from audiodeepfake_detection_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    rng = np.random.RandomState(0)
    batch = {
        "audio": rng.randn(B, 1, T).astype(np.float32),
        "label": rng.randint(0, 2, B).astype(np.int32),
    }
    tx = make_optimizer(4e-4, 1e-3)
    img = transform(jnp.asarray(batch["audio"][:16]))
    state = create_train_state(model, tx, img, seed=0)
    step = make_train_step(model, transform, tx)
    dbatch = jax.device_put(batch)
    t0 = time.time()
    state, stats = step(state, dbatch)
    float(stats["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        state, stats = step(state, dbatch)
    float(stats["loss"])
    dt = time.time() - t0
    print(
        f"{tag}: {dt / steps * 1000:.2f} ms/step, {steps * B / dt:.0f} frames/s "
        f"(compile {compile_s:.0f}s)",
        flush=True,
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audiodeepfake_detection_tpu.models import DCNN, LCNN
    from audiodeepfake_detection_tpu.ops.stft import spectrogram
    from audiodeepfake_detection_tpu.ops.wpt import packet_image

    def wpt_transform(audio):
        # speed mode, same as bench.py (see headline_setup)
        return packet_image(
            audio, "sym5", level=8, log_scale=True, power=2.0,
            precision=jax.lax.Precision.DEFAULT,
        )

    def stft_transform(audio):
        return spectrogram(
            audio, n_fft=511, hop_length=220, power=2.0, log_scale=True
        )

    fast = dict(precision=jax.lax.Precision.DEFAULT, dtype=jnp.bfloat16)
    # fused_layer1: the Pallas conv1+PReLU+pool block (ops/fused_conv1.py),
    # the production speed configuration (bench.py).
    bench_step(
        DCNN(time_dim=12, fused_layer1=True, **fast),
        wpt_transform,
        "packets-sym5 + DCNN bf16 fused-l1",
    )
    bench_step(
        DCNN(time_dim=12, fused_layer1=True, **fast),
        stft_transform,
        "stft + DCNN bf16 fused-l1",
    )
    bench_step(
        LCNN(lstm_channels=256, fused_layer1=True, **fast),
        stft_transform,
        "stft + LCNN bf16 fused-l1",
    )
    # fused_layer1=True engages the kernel only under train=True, so this
    # measures the XLA eval forward (which beats the kernel for inference)
    bench_eval(
        DCNN(time_dim=12, fused_layer1=True, **fast),
        wpt_transform,
        "packets-sym5 + DCNN bf16 eval",
    )
    # post-training int8: convs run s8xs8->s32 on the MXU (ops/quantize.py)
    bench_eval(
        DCNN(time_dim=12, fused_layer1=True, **fast),
        wpt_transform,
        "packets-sym5 + DCNN int8 eval",
        quantize=True,
    )


def bench_eval(model, transform, tag, steps=50, quantize=False):
    import jax
    import jax.numpy as jnp

    from audiodeepfake_detection_tpu.train.steps import (
        create_train_state,
        make_eval_step,
        make_optimizer,
    )

    rng = np.random.RandomState(0)
    batch = {
        "audio": rng.randn(B, 1, T).astype(np.float32),
        "label": rng.randint(0, 2, B).astype(np.int32),
        "weight": np.ones(B, np.float32),
    }
    img = transform(jnp.asarray(batch["audio"][:16]))
    state = create_train_state(model, make_optimizer(4e-4, 1e-3), img, seed=0)
    if quantize:
        from audiodeepfake_detection_tpu.ops.quantize import quantize_dcnn

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        model, _ = quantize_dcnn(
            model, variables, [transform(jnp.asarray(batch["audio"]))]
        )
    eval_step = make_eval_step(model, transform)
    dbatch = jax.device_put(batch)
    res = eval_step(state.params, state.batch_stats, dbatch)
    float(res["total"])
    t0 = time.time()
    for _ in range(steps):
        res = eval_step(state.params, state.batch_stats, dbatch)
    float(res["total"])
    dt = time.time() - t0
    print(
        f"{tag}: {dt / steps * 1000:.2f} ms/step, {steps * B / dt:.0f} frames/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
