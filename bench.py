#!/usr/bin/env python
"""End-to-end training-step throughput benchmark (headline configuration).

Measures the fully fused train step — wavelet-packet transform (fused Pallas
kernel) + normalization + DCNN forward/backward + Adam — for the reference's
headline configuration (packets-sym5, level 8, batch 128, 1 s frames @
22050 Hz; cf. BASELINE.md) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

``vs_baseline`` is the ratio over the reference-equivalent torch-CPU
pipeline measured on this host (recorded in bench_baseline.json; re-measure
with --measure-cpu, which takes ~2 min on the 1-core container).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

BATCH = 128
T = 22050
WAVELET = "sym5"
LEVEL = 8
STEPS = 100
WINDOWS = 3  # independent timed windows; report median (relay-load-proof)


def measure_tpu():
    import jax

    try:  # persistent cache: repeat benchmark runs skip the remote compile
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
        time_dim=12, precision=jax.lax.Precision.DEFAULT, dtype=jnp.bfloat16,
        fused_layer1=True,  # Pallas conv1+PReLU+pool block (ops/fused_conv1.py)
    )

    def transform(audio):
        # speed-mode bench: one bf16 MXU pass in the WPT's banded dots
        return packet_image(
            audio, WAVELET, level=LEVEL, log_scale=True, power=2.0,
            precision=jax.lax.Precision.DEFAULT,
        )

    tx = make_optimizer(4e-4, 1e-3)
    rng = np.random.RandomState(0)
    batch = {
        "audio": rng.randn(BATCH, 1, T).astype(np.float32),
        "label": rng.randint(0, 2, BATCH).astype(np.int32),
    }
    img = transform(jnp.asarray(batch["audio"][:16]))
    state = create_train_state(model, tx, img, seed=0)
    step = make_train_step(model, transform, tx)
    dbatch = jax.device_put(batch)
    state, stats = step(state, dbatch)
    float(stats["loss"])  # warmup + compile

    # WINDOWS independent timed windows (round-4 verdict weak #1): a single
    # 100-step sample is hostage to one relay-load draw — r4's driver number
    # (13.10 ms) disagreed with every interactive measurement (12.4 ms) and
    # the protocol could not say whether code or relay regressed.  Median of
    # >=3 fresh dispatch chains, with min + spread in the JSON, makes the
    # driver metric adjudicable.  Each window ends with a VALUE fetch
    # (CLAUDE.md: the relay's block_until_ready can return early).
    window_s = []
    for _ in range(WINDOWS):
        t0 = time.time()
        for _ in range(STEPS):
            state, stats = step(state, dbatch)
        float(stats["loss"])  # force completion of the chain
        window_s.append((time.time() - t0) / STEPS)
    step_s = float(np.median(window_s))

    # Efficiency, not just throughput (round-3 verdict weak #7): achieved
    # HBM bandwidth / MFU so the driver-captured JSON catches efficiency
    # regressions that frames/s hides.  Pallas custom calls report ~0
    # bytes/flops to XLA's cost analysis; utils/costs.py recovers their
    # operand+result traffic from the compiled HLO, so hbm_util covers the
    # WHOLE step (XLA ops + fused Mosaic kernels).  MFU remains XLA-only
    # (Pallas flops are unrecoverable from an opaque call) — for this
    # bandwidth-bound step hbm_util is the binding roofline anyway.
    eff = {}
    try:
        from audiodeepfake_detection_tpu.utils.costs import compiled_cost

        cost = compiled_cost(step.lower(state, dbatch).compile())
        if cost["bytes"] > 0:
            eff["xla_bytes_per_step"] = cost["xla_bytes"]
            if cost["pallas_bytes"] > 0:
                eff["pallas_bytes_per_step"] = cost["pallas_bytes"]
            # v5e HBM peak ~819 GB/s
            eff["hbm_gbps"] = cost["bytes"] / step_s / 1e9
            eff["hbm_util"] = cost["bytes"] / step_s / 819e9
        if cost["xla_flops"] > 0:
            # v5e bf16 peak ~197 TFLOP/s
            eff["mfu"] = cost["xla_flops"] / step_s / 197e12
    except Exception:
        pass
    eff["step_ms_min"] = min(window_s) * 1e3
    eff["step_ms_windows"] = [round(s * 1e3, 3) for s in window_s]
    eff["window_spread_pct"] = (
        (max(window_s) - min(window_s)) / step_s * 100.0
    )
    return BATCH / step_s, step_s, eff


def measure_end_to_end(
    frame_cache: bool, steps_per_call: int = 1, device_data: bool = False
) -> float:
    """Sustained loader -> H2D -> train-step throughput with real files.

    Builds a synthetic wav corpus, optionally pre-decodes it into the frame
    cache (int16 batches, on-device conversion), and measures wall-clock
    frames/s including all host input work — the number BENCH_r01 lacked
    (round-1 verdict weak #3).

    ``device_data`` parks the whole corpus in HBM once (int16) and ships
    only [G, B] int32 indices per dispatch (train/device_data.py) — the
    answer to the relay-bound e2e regime, where a G=4 superbatch otherwise
    moves ~11 MB of audio through the ~85 ms-RTT relay every dispatch.
    """
    import shutil
    import sys
    import tempfile

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, os.path.join(HERE, "tools"))
    from bench_loader import build_corpus

    from audiodeepfake_detection_tpu.data.dataset import CustomDataset
    from audiodeepfake_detection_tpu.data.frame_cache import build_frame_cache
    from audiodeepfake_detection_tpu.data.loader import FrameLoader
    from audiodeepfake_detection_tpu.models import DCNN
    from audiodeepfake_detection_tpu.ops.wpt import packet_image
    from audiodeepfake_detection_tpu.parallel.mesh import (
        device_prefetch,
        get_mesh,
        shard_batch,
    )
    from audiodeepfake_detection_tpu.train.steps import (
        create_train_state,
        make_multi_train_step,
        make_optimizer,
        make_train_step,
        stack_batches,
    )

    root = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        d = build_corpus(root, n_files=60, secs_per_file=30, sr=22050)
        ds = CustomDataset(
            paths=[d], labels=[0], save_path=root, ds_type="test",
            train_ratio=0.0, val_ratio=0.0, resample_rate=22050, seconds=1,
        )
        if frame_cache:
            build_frame_cache(ds)
        loader = FrameLoader(
            ds, BATCH, shuffle=True, drop_last=True, seed=0,
            use_frame_cache=None if frame_cache else False,
            emit="int16" if frame_cache else "float32",
        )

        model = DCNN(
            time_dim=12,
            precision=jax.lax.Precision.DEFAULT,
            dtype=jnp.bfloat16,
            fused_layer1=True,  # the headline speed configuration
        )

        def transform(audio):
            return packet_image(
                audio, WAVELET, level=LEVEL, log_scale=True, power=2.0,
                precision=jax.lax.Precision.DEFAULT,
            )

        tx = make_optimizer(4e-4, 1e-3)
        first = next(iter(loader.epoch(0)))
        img = transform(jnp.asarray(first["audio"][:16], jnp.float32))
        state = create_train_state(model, tx, img, seed=0)
        mesh = get_mesh(jax.devices()[:1])
        g = max(1, steps_per_call)
        if device_data:
            from audiodeepfake_detection_tpu.train.device_data import (
                ResidentData,
            )
            from audiodeepfake_detection_tpu.train.steps import (
                make_resident_multi_train_step,
            )

            res = ResidentData(loader, mesh)
            resident_step = make_resident_multi_train_step(
                model, transform, tx, mesh
            )

            def run_epoch(epoch, state):
                order = loader._order(epoch, True)
                n_full = len(order) // BATCH
                idx = order[: n_full * BATCH].astype(np.int32)
                idx = idx.reshape(n_full, BATCH)
                stats, n = None, 0
                for s in range(0, n_full, g):
                    rows = idx[s : s + g]
                    device_idx = shard_batch(mesh, rows, batch_axis=1)
                    state, stats = resident_step(
                        state, res.audio, res.labels, device_idx
                    )
                    n += rows.shape[0] * BATCH
                return state, stats, n

        elif g > 1:
            step = make_multi_train_step(model, transform, tx)
            single = make_train_step(model, transform, tx)

            def run_epoch(epoch, state):
                n, buf = 0, []
                stats = None
                for batch in loader.epoch(epoch):
                    buf.append(batch)
                    if len(buf) == g:
                        group = shard_batch(mesh, stack_batches(buf), batch_axis=1)
                        state, stats = step(state, group)
                        n += g * BATCH
                        buf.clear()
                # remainder: single steps, like the trainer (previously the
                # tail batches were decoded inside the timed window but
                # never dispatched or counted)
                for batch in buf:
                    state, stats = single(state, shard_batch(mesh, batch))
                    n += BATCH
                return state, stats, n
        else:
            step = make_train_step(model, transform, tx)

            def run_epoch(epoch, state):
                n = 0
                stats = None
                for batch in device_prefetch(loader.epoch(epoch), mesh):
                    state, stats = step(state, batch)
                    n += BATCH
                return state, stats, n

        # warm epoch compiles + fills page cache
        state, stats, _ = run_epoch(0, state)
        float(np.sum(stats["loss"]))

        n = 0
        t0 = time.time()
        for epoch in (1, 2):
            state, stats, ne = run_epoch(epoch, state)
            n += ne
        float(np.sum(stats["loss"]))
        return n / (time.time() - t0)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def cpu_baseline(measure: bool) -> float:
    path = os.path.join(HERE, "bench_baseline.json")
    if not measure and os.path.exists(path):
        with open(path) as fh:
            return float(json.load(fh)["frames_per_sec"])
    # Re-measure: torch conv1d WPT cascade (math-identical to ptwt) +
    # reference DCNN oracle + Adam on CPU.
    import sys

    sys.path.insert(0, os.path.join(HERE, "tests"))
    import torch
    from reference_oracle import reference_dcnn

    from audiodeepfake_detection_tpu.ops.wavelets import get_wavelet

    torch.manual_seed(0)
    model = reference_dcnn("DCNN", input_dim=[BATCH, 1, 256, 95], time_dim_add=1)

    def to_bn(m):
        for name, child in m.named_children():
            if isinstance(child, torch.nn.SyncBatchNorm):
                setattr(
                    m,
                    name,
                    torch.nn.BatchNorm2d(child.num_features, affine=child.affine),
                )
            else:
                to_bn(child)

    to_bn(model)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=4e-4, weight_decay=1e-3)
    lossf = torch.nn.CrossEntropyLoss()
    w = get_wavelet(WAVELET)
    dec = torch.tensor(
        np.stack([w.dec_lo[::-1], w.dec_hi[::-1]])[:, None, :], dtype=torch.float32
    )
    filt_len = dec.shape[-1]

    def wpt(x):
        y = x[:, None, :]
        for _ in range(LEVEL):
            b, nodes, n = y.shape
            padl = (2 * filt_len - 3) // 2
            padr = padl + (n % 2)
            y = y.reshape(b * nodes, 1, n)
            y = torch.nn.functional.pad(y, (padl, padr), mode="reflect")
            y = torch.nn.functional.conv1d(y, dec, stride=2)
            y = y.reshape(b, nodes * 2, y.shape[-1])
        idx = torch.arange(2**LEVEL)
        idx = idx ^ (idx >> 1)
        return torch.log(torch.abs(y[:, idx, :]) ** 2 + 1e-12)[:, None]

    audio = torch.randn(BATCH, T)
    labels = torch.randint(0, 2, (BATCH,))

    def step():
        opt.zero_grad()
        with torch.no_grad():
            img = wpt(audio)
        loss = lossf(model(img), labels)
        loss.backward()
        opt.step()

    step()
    n = 2
    t0 = time.time()
    for _ in range(n):
        step()
    return n * BATCH / (time.time() - t0)


def wait_for_tpu(max_wait_s: float) -> None:
    """Block until the accelerator backend initializes.

    The TPU here sits behind a relay that has observable multi-minute
    outages; a failed backend init is cached for the process lifetime, so
    availability is probed in FRESH subprocesses and the measuring process
    only touches the backend after a probe succeeds.  Bounded by
    ``max_wait_s`` (env ``BENCH_TPU_WAIT_S``); each probe itself is capped
    at 10 min (a down relay can sit in init for 25+ min before erroring).
    """
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        probe_cap = min(600.0, max(60.0, max_wait_s))
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                text=True,
                timeout=probe_cap,
            )
            ok, err = probe.returncode == 0, probe.stderr
        except subprocess.TimeoutExpired:
            ok, err = False, f"probe timed out after {probe_cap:.0f} s"
        if ok:
            return
        attempt += 1
        if time.time() >= deadline:
            raise RuntimeError(
                "accelerator backend unavailable after "
                f"{max_wait_s:.0f} s ({attempt} probes); last error:\n"
                + str(err)[-2000:]
            )
        print(
            f"(backend unavailable, probe {attempt}; retrying in 60 s)",
            flush=True,
            file=sys.stderr,  # stdout carries ONLY the benchmark JSON line
        )
        time.sleep(60)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--measure-cpu", action="store_true")
    parser.add_argument(
        "--end-to-end",
        action="store_true",
        help="include host decode/input pipeline (synthetic wav corpus)",
    )
    parser.add_argument("--no-frame-cache", action="store_true")
    parser.add_argument("--steps-per-call", type=int, default=1)
    parser.add_argument(
        "--device-data",
        action="store_true",
        help="HBM-resident corpus: dispatches ship only int32 indices",
    )
    args = parser.parse_args()
    wait_for_tpu(float(os.environ.get("BENCH_TPU_WAIT_S", 1500)))
    if args.end_to_end:
        fps = measure_end_to_end(
            frame_cache=not args.no_frame_cache,
            steps_per_call=args.steps_per_call,
            device_data=args.device_data,
        )
        src = (
            "device-resident"
            if args.device_data
            else ("frame cache" if not args.no_frame_cache else "native decode")
        )
        print(
            json.dumps(
                {
                    "metric": "end-to-end train throughput incl. input pipeline"
                    f" ({src},"
                    f" {args.steps_per_call} steps/dispatch)",
                    "value": round(fps, 1),
                    "unit": "frames/sec/chip",
                    "vs_baseline": round(fps / cpu_baseline(False), 1),
                }
            )
        )
        return
    fps, step_s, eff = measure_tpu()
    base = cpu_baseline(args.measure_cpu)
    payload = {
        "metric": "fused train-step throughput (packets-sym5 + DCNN, batch 128, 1s@22050Hz)",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / base, 1),
        "step_ms": round(step_s * 1e3, 3),
    }
    for k, v in eff.items():
        if isinstance(v, list):
            payload[k] = v
        else:
            payload[k] = round(v, 4) if v < 1e6 else round(v)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
