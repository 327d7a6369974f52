"""Vectorized multi-seed sweep benchmark (train/vectorized.py).

Measures the DCNN headline step (packets-sym5 level 8; ``--fused`` runs
the fused Pallas speed path with the seed axis as a lax.map inside the
program — ``seed_axis="scan"``, what the sweep runner picks for fused
models) in three regimes on the local chip:

1. serial, device-bound: one seed, STEPS async-chained steps (the sweep
   baseline — S seeds run back-to-back at this per-seed rate);
2. vectorized, device-bound: S seeds per step, same chaining;
3. both, dispatch-bound: one host fetch per step (every step waits for the
   ~85 ms relay round trip — the regime of the e2e loop with fresh data),
   where the vectorized step advances S seeds per round trip.

The device-bound ratio shows the utilization gain (small for the large
headline batch); the dispatch-bound ratio approaches S — the reason the
sweep runner exists.  Reference counterpart: seeds are trained strictly
serially (train_classifier.py:1147).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVELET = "sym5"
LEVEL = 8
T = 22050


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sync-steps", type=int, default=10)
    ap.add_argument(
        "--fused", action="store_true",
        help="fused Pallas layer-1 kernel + seed_axis='scan' (the sweep's "
        "automatic mode for fused models)",
    )
    args = ap.parse_args()

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
    from audiodeepfake_detection_tpu.train.vectorized import (
        create_vectorized_state,
        make_vectorized_train_step,
    )

    model = DCNN(
        time_dim=12, precision=jax.lax.Precision.DEFAULT, dtype=jnp.bfloat16,
        fused_layer1=bool(args.fused),
    )
    seed_axis = "scan" if args.fused else "vmap"

    def transform(audio):
        return packet_image(
            audio, WAVELET, level=LEVEL, log_scale=True, power=2.0,
            precision=jax.lax.Precision.DEFAULT,
        )

    tx = make_optimizer(4e-4, 1e-3)
    rng = np.random.RandomState(0)
    B, S = args.batch, args.seeds
    batch = {
        "audio": rng.randn(B, 1, T).astype(np.float32),
        "label": rng.randint(0, 2, B).astype(np.int32),
    }
    vbatch = {
        "audio": np.stack([batch["audio"]] * S),
        "label": np.stack([batch["label"]] * S),
    }
    img = transform(jnp.asarray(batch["audio"][:16]))

    def fetch(stats):
        # scalar for the serial step, [S] for the vectorized one
        np.asarray(jax.tree.leaves(stats)[0]).sum()

    def timed(step, state, dbatch, n, sync_every):
        state, stats = step(state, dbatch)  # warmup/compile
        fetch(stats)
        t0 = time.time()
        for i in range(n):
            state, stats = step(state, dbatch)
            if sync_every and (i + 1) % sync_every == 0:
                fetch(stats)
        fetch(stats)
        return time.time() - t0

    serial_step = make_train_step(model, transform, tx)
    vec_step = make_vectorized_train_step(
        model, transform, tx, seed_axis=seed_axis
    )

    st = create_train_state(model, tx, img, seed=0)
    dt_serial = timed(serial_step, st, jax.device_put(batch), args.steps, 0)
    fps_serial = B * args.steps / dt_serial

    vst = create_vectorized_state(
        model, tx, img, list(range(S)), seed_axis=seed_axis
    )
    dt_vec = timed(vec_step, vst, jax.device_put(vbatch), args.steps, 0)
    fps_vec = S * B * args.steps / dt_vec

    # dispatch-bound: force a host round trip every step
    st = create_train_state(model, tx, img, seed=0)
    dt_serial_rt = timed(
        serial_step, st, jax.device_put(batch), args.sync_steps, 1
    )
    fps_serial_rt = B * args.sync_steps / dt_serial_rt
    vst = create_vectorized_state(
        model, tx, img, list(range(S)), seed_axis=seed_axis
    )
    dt_vec_rt = timed(
        vec_step, vst, jax.device_put(vbatch), args.sync_steps, 1
    )
    fps_vec_rt = S * B * args.sync_steps / dt_vec_rt

    mode = f"fused+{seed_axis}" if args.fused else seed_axis
    print(
        f"[{mode}] device-bound : serial {fps_serial:9.1f} frames/s | "
        f"vectorized(S={S}) {fps_vec:9.1f} frames/s | "
        f"x{fps_vec / fps_serial:.2f}"
    )
    print(
        f"[{mode}] dispatch-bound: serial {fps_serial_rt:9.1f} frames/s | "
        f"vectorized(S={S}) {fps_vec_rt:9.1f} frames/s | "
        f"x{fps_vec_rt / fps_serial_rt:.2f}"
    )


if __name__ == "__main__":
    main()
