"""HTTP scoring microservice with cross-request micro-batching.

Production serving front-end the reference has no analogue for (its
closest mode is ``--only-testing`` over a prepared dataset,
src/audiofakedetect/train_classifier.py:1043-1076): a trained snapshot
becomes a long-lived HTTP endpoint that scores raw wav/flac uploads.

TPU-shaped design:

* ONE jitted scorer at a fixed batch size — XLA compiles once at startup
  (warm-up dispatch) and never recompiles, because every dispatch is
  padded to the same static ``[B, 1, T]`` shape.
* cross-request micro-batching: concurrent HTTP requests land in one
  queue; a single dispatcher thread coalesces their frames (up to
  ``batch_size``, waiting at most ``max_wait_ms`` for stragglers) into
  shared device batches, so the MXU sees large batches even when each
  client sends one short clip.  One device, one dispatch stream — no
  per-request ``jit`` traffic jams.
* decode/framing/resampling run host-side in the HTTP worker threads
  (the C++ decoder releases the GIL), overlapping the device dispatches.

Endpoints::

    POST /score[?aggregate=mean|max]   body = wav or flac bytes
        -> {"p_fake": float, "frames": int, "frame_scores": [float, ...]}
    GET  /healthz
        -> {"status": "ok", "model": ..., "batch_size": ..., ...}

CLI::

    python -m audiodeepfake_detection_tpu.train.serve snapshot.pt \
        --port 8417 [--norm stats.pkl | --mean .. --std ..] \
        [--int8 --calibrate clips_dir] [--batch-size 64] [--max-wait-ms 5]
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np


@dataclass
class _Request:
    frames: np.ndarray  # [n, win] float32
    aggregate: str
    future: Future = field(default_factory=Future)


class ScoringService:
    """Micro-batching scorer: many concurrent clips, one dispatch stream.

    Usable directly (``submit`` / ``score_clip``) or behind the HTTP
    front-end (``serve``).  ``start``/``stop`` manage the dispatcher
    thread; the constructor compiles and warms the jitted scorer so the
    first real request never pays the compile.
    """

    def __init__(
        self,
        model,
        transform: Callable,
        variables,
        sample_rate: int = 22050,
        seconds: float = 1.0,
        batch_size: int = 64,
        max_wait_ms: float = 5.0,
        output: str = "prob",
        warmup: bool = True,
        max_body_bytes: int = 64 << 20,
        request_timeout_s: float = 120.0,
        pcm16: bool = False,
        chunk: Optional[int] = None,
    ) -> None:
        import jax.numpy as jnp

        from .predict import make_score_fn

        self.sample_rate = int(sample_rate)
        self.win = int(seconds * sample_rate)
        self.batch_size = int(batch_size)
        self.max_wait_ms = float(max_wait_ms)
        self.max_body_bytes = int(max_body_bytes)
        self.request_timeout_s = float(request_timeout_s)
        # ship frames to the device as int16 PCM, converting in-graph:
        # halves H2D bytes per dispatch — decisive when the device link is
        # the bottleneck (the training loader's emit="int16" trick applied
        # to serving).  Bit-exact for 16-bit wav uploads (decode is
        # pcm/32768, re-round is exact); float submissions quantize to 16
        # bits (~96 dB SNR, far below the model's sensitivity).
        self.pcm16 = bool(pcm16)
        self._frame_dtype = np.int16 if pcm16 else np.float32
        # chunk: scan the model forward over microbatches inside the
        # dispatch — large AST batches lose VMEM residency (measured knee,
        # docs/benchmarks.md "AST serving batch knee"); DCNN/LCNN have no
        # knee below b1024.  None = auto: 32 for the AST (measured best
        # general setting — int8-baked b128 +25%, bf16 b128 +19%; 16 edges
        # it out for int8 at b512), 0 (whole batch) for everything else.
        if chunk is None:
            from ..models.ast import ASTModel

            chunk = 32 if isinstance(model, ASTModel) else 0
        self.chunk = int(chunk)
        self._score = make_score_fn(
            model, transform, variables, output=output, chunk=self.chunk
        )
        self._queue: "queue.Queue" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._stop = object()
        self.model_name = type(model).__name__
        self.n_scored = 0
        self.n_dispatches = 0
        if warmup:  # compile the one static shape before serving traffic
            self._score(
                jnp.zeros(
                    (self.batch_size, 1, self.win),
                    jnp.int16 if self.pcm16 else jnp.float32,
                )
            ).block_until_ready()

    # ------------------------------------------------------------ lifecycle

    def start(self) -> "ScoringService":
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._dispatch_loop, daemon=True
            )
            self._thread.start()
        return self

    def stop(self) -> None:
        if self._thread is not None:
            self._queue.put(self._stop)
            self._thread.join()
            self._thread = None

    def __enter__(self) -> "ScoringService":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # ------------------------------------------------------------- scoring

    def frame_clip(self, audio: np.ndarray, in_rate: int) -> np.ndarray:
        """Resample + cut a 1-D clip into ``[n, win]`` scoring frames."""
        from ..ops.audio import resample

        if in_rate > self.sample_rate:
            audio = resample(audio, in_rate, self.sample_rate)
        elif in_rate < self.sample_rate:
            raise ValueError(
                f"clip sample rate {in_rate} < service rate "
                f"{self.sample_rate}; no upsampling here"
            )
        n = len(audio) // self.win
        if n == 0:
            raise ValueError(
                f"clip shorter than one {self.win}-sample frame"
            )
        frames = np.asarray(audio[: n * self.win], np.float32).reshape(
            n, self.win
        )
        return self._to_wire(frames)

    def _to_wire(self, frames: np.ndarray) -> np.ndarray:
        """Convert float frames to the wire dtype (int16 when pcm16)."""
        if not self.pcm16 or frames.dtype == np.int16:
            return frames
        return np.clip(
            np.round(frames.astype(np.float32) * 32768.0), -32768, 32767
        ).astype(np.int16)

    def submit(self, frames: np.ndarray, aggregate: str = "mean") -> Future:
        """Queue pre-framed audio ``[n, win]``; resolves to the clip score.

        The future's result is ``(clip_score, frame_scores)``.
        """
        if self.pcm16:
            frames = self._to_wire(np.ascontiguousarray(frames))
        else:
            frames = np.ascontiguousarray(frames, np.float32)
        if frames.ndim != 2 or frames.shape[1] != self.win:
            raise ValueError(
                f"expected [n, {self.win}] frames, got {frames.shape}"
            )
        if frames.shape[0] == 0:  # empty slice would mean() to NaN p_fake
            raise ValueError("no frames to score (empty clip)")
        if aggregate not in ("mean", "max"):
            raise ValueError(f"aggregate must be mean or max: {aggregate}")
        if self._thread is None:
            raise RuntimeError("service not started (call start())")
        req = _Request(frames, aggregate)
        self._queue.put(req)
        return req.future

    def score_clip(
        self, audio: np.ndarray, in_rate: int, aggregate: str = "mean"
    ):
        """Blocking decode-side entry: 1-D clip -> (score, frame_scores)."""
        return self.submit(self.frame_clip(audio, in_rate), aggregate).result()

    # ------------------------------------------------------------ dispatcher

    def _collect(self) -> Optional[List[_Request]]:
        """Block for one request, then coalesce stragglers.

        Keeps pulling until the pending frame count reaches one device
        batch or ``max_wait_ms`` passes — the classic serving
        micro-batcher.  Returns None on shutdown.
        """
        import time

        first = self._queue.get()
        if first is self._stop:
            return None
        pending = [first]
        n = len(first.frames)
        deadline = time.monotonic() + self.max_wait_ms / 1e3
        while n < self.batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is self._stop:
                self._queue.put(self._stop)  # re-queue for the outer loop
                break
            pending.append(nxt)
            n += len(nxt.frames)
        return pending

    def _dispatch_loop(self) -> None:
        import jax.numpy as jnp

        while True:
            pending = self._collect()
            if pending is None:
                return
            # The loop must survive any per-batch failure (transient relay
            # error, device OOM): fail THESE requests, keep serving the next
            # — a dead daemon dispatcher would leave every future pending
            # forever while /healthz still answered ok.
            try:
                frames = np.concatenate([r.frames for r in pending])
                scores = np.empty(len(frames), np.float32)
                # pipeline chunk dispatches (jax dispatch is async) with a
                # bounded in-flight window: a blocking fetch per chunk
                # would pay one full host<->device round trip per
                # batch_size frames (~85 ms each through the TPU relay)
                # with the device idle in between, while an unbounded
                # queue would hold every input buffer in HBM at once for
                # giant direct submit()s
                outs = []

                def drain(until):
                    while len(outs) > until:
                        s, n, out = outs.pop(0)
                        scores[s : s + n] = np.asarray(out)[:n]

                for s in range(0, len(frames), self.batch_size):
                    chunk = frames[s : s + self.batch_size]
                    batch = np.zeros(
                        (self.batch_size, 1, self.win), self._frame_dtype
                    )  # pad to THE static shape: zero recompiles by construction
                    batch[: len(chunk), 0] = chunk
                    outs.append((s, len(chunk), self._score(jnp.asarray(batch))))
                    self.n_dispatches += 1
                    drain(8)
                drain(0)
            except Exception as exc:
                for req in pending:
                    if not req.future.done():
                        req.future.set_exception(exc)
                continue
            off = 0
            for req in pending:
                fs = scores[off : off + len(req.frames)]
                off += len(req.frames)
                agg = float(fs.max() if req.aggregate == "max" else fs.mean())
                req.future.set_result((agg, fs.copy()))
                self.n_scored += len(req.frames)

    # ----------------------------------------------------------------- http

    def serve(self, host: str = "127.0.0.1", port: int = 8417) -> None:
        """Run the HTTP front-end (blocking; ``make_server`` is the
        non-blocking variant used by tests/embedders)."""
        server = self.make_server(host, port)
        print(
            f"serving {self.model_name} on http://{host}:{server.server_port}"
            f"  (batch {self.batch_size}, frame {self.win} samples)"
        )
        try:
            server.serve_forever()
        finally:
            server.server_close()

    def make_server(self, host: str = "127.0.0.1", port: int = 0):
        """Build (don't run) the threaded HTTP server — test hook."""
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        service = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: one line per request is noise
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path.split("?")[0] != "/healthz":
                    return self._reply(404, {"error": "unknown path"})
                self._reply(
                    200,
                    {
                        "status": "ok",
                        "model": service.model_name,
                        "batch_size": service.batch_size,
                        "sample_rate": service.sample_rate,
                        "frame_samples": service.win,
                        "pcm16": service.pcm16,
                        "chunk": service.chunk,
                        "frames_scored": service.n_scored,
                        "dispatches": service.n_dispatches,
                    },
                )

            def do_POST(self):
                import urllib.parse

                path, _, query = self.path.partition("?")
                if path != "/score":
                    return self._reply(404, {"error": "unknown path"})
                params = urllib.parse.parse_qs(query)
                aggregate = params.get("aggregate", ["mean"])[0]
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    if length <= 0:
                        raise ValueError("empty body (expected audio bytes)")
                    if length > service.max_body_bytes:
                        # drain (bounded) before replying: closing with
                        # unread data in the receive buffer sends a TCP
                        # RST and the client never sees the 413 JSON
                        remaining = min(length, 8 << 20)
                        while remaining > 0:
                            got = self.rfile.read(min(remaining, 1 << 16))
                            if not got:
                                break
                            remaining -= len(got)
                        self.close_connection = True
                        return self._reply(
                            413,
                            {
                                "error": "body too large "
                                f"({length} > {service.max_body_bytes} bytes)"
                            },
                        )
                    raw = self.rfile.read(length)
                    frames = service._decode_upload(raw)
                    score, frame_scores = service.submit(
                        frames, aggregate
                    ).result(timeout=service.request_timeout_s)
                except ValueError as exc:
                    return self._reply(400, {"error": str(exc)})
                except Exception as exc:  # dispatch failure / timeout: 5xx
                    return self._reply(
                        503, {"error": f"scoring failed: {exc}"}
                    )
                self._reply(
                    200,
                    {
                        "p_fake": score,
                        "frames": len(frame_scores),
                        "frame_scores": [float(x) for x in frame_scores],
                        "aggregate": aggregate,
                    },
                )

        return ThreadingHTTPServer((host, port), Handler)

    def _decode_upload(self, raw: bytes) -> np.ndarray:
        """Decode an uploaded wav/flac body into scoring frames."""
        import os
        import tempfile

        from ..data.wavio import audio_read

        if raw[:4] == b"RIFF":
            suffix = ".wav"
        elif raw[:4] == b"fLaC":
            suffix = ".flac"
        else:
            raise ValueError(
                "unrecognized audio container (expected RIFF/WAVE or fLaC)"
            )
        fd, path = tempfile.mkstemp(suffix=suffix)
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(raw)
            try:
                audio, rate = audio_read(path)
            except Exception as exc:  # corrupt body: client error, not 500
                raise ValueError(f"undecodable audio: {exc}") from exc
            return self.frame_clip(audio, rate)
        finally:
            os.unlink(path)


def service_from_snapshot(
    snapshot: str,
    norm: Optional[str] = None,
    mean=None,
    std=None,
    batch_size: int = 64,
    max_wait_ms: float = 5.0,
    int8: bool = False,
    calibrate: Sequence[str] = (),
    use_pallas: Optional[bool] = None,
    output: str = "prob",
    pcm16: bool = False,
    chunk: Optional[int] = None,
) -> ScoringService:
    """Build a ready-to-start service from a config-encoded ``.pt``.

    ``int8`` quantizes post-training (ops/quantize.py) with activation
    scales calibrated on ``calibrate`` (files/dirs) through the SAME
    normalized transform the service scores with.  ``pcm16`` ships
    frames to the device as int16 PCM (halved H2D bytes, in-graph
    conversion; bit-exact for 16-bit wav uploads).
    """
    import jax.numpy as jnp

    from .predict import _expand_inputs, build_scorer_from_snapshot

    model, transform, variables, cfg = build_scorer_from_snapshot(
        snapshot, norm=norm, mean=mean, std=std, use_pallas=use_pallas
    )
    sr, sec = int(cfg.sample_rate), float(cfg.seconds)
    if int8:
        from ..data.wavio import audio_read
        from ..models.dcnn import DCNN
        from ..ops.audio import resample
        from ..ops.quantize import DEFAULT_INT8_SITES, quantize_model

        paths = _expand_inputs(list(calibrate))
        if not paths:
            raise ValueError("--int8 needs --calibrate files/dirs")
        win = int(sr * sec)
        frames: List[np.ndarray] = []
        for p in paths:
            audio, in_sr = audio_read(p)
            if in_sr > sr:
                audio = resample(audio, in_sr, sr)
            for i in range(len(audio) // win):
                frames.append(audio[i * win : (i + 1) * win])
        if not frames:
            raise ValueError("calibration clips shorter than one frame")

        def _calib_images(max_batches: int = 4):
            for s in range(
                0, min(len(frames), max_batches * batch_size), batch_size
            ):
                chunk = np.stack(frames[s : s + batch_size])
                yield transform(jnp.asarray(chunk[:, None, :]))

        include = DEFAULT_INT8_SITES if isinstance(model, DCNN) else None
        model, _ = quantize_model(
            model, variables, _calib_images(), include=include
        )
        # bake int8 kernels + scales into the variables: the service's
        # jitted scorer then reads int8 weights, not the fp masters
        from ..ops.quantize import bake_int8_weights

        variables = bake_int8_weights(
            model, variables, next(iter(_calib_images(1)))
        )
    return ScoringService(
        model,
        transform,
        variables,
        sample_rate=sr,
        seconds=sec,
        batch_size=batch_size,
        max_wait_ms=max_wait_ms,
        output=output,
        pcm16=pcm16,
        chunk=chunk,
    )


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="Serve a trained deepfake detector over HTTP"
    )
    parser.add_argument("snapshot", help=".pt snapshot (config-encoded name)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8417)
    parser.add_argument("--norm", default=None, help="*_mean_std.pkl")
    parser.add_argument("--mean", type=float, nargs="+", default=None)
    parser.add_argument("--std", type=float, nargs="+", default=None)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument(
        "--max-wait-ms", type=float, default=5.0,
        help="micro-batcher straggler wait",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="post-training int8 (requires --calibrate)",
    )
    parser.add_argument(
        "--calibrate", nargs="+", default=[],
        help="clips/dirs for int8 activation calibration",
    )
    parser.add_argument(
        "--output", default="prob", choices=("prob", "margin"),
        help="score head (see predict.make_score_fn)",
    )
    parser.add_argument(
        "--use-pallas", dest="use_pallas", action="store_true", default=None,
        help="force the fused Pallas transform path",
    )
    parser.add_argument(
        "--no-pallas", dest="use_pallas", action="store_false",
        help="force the XLA transform path",
    )
    parser.add_argument(
        "--pcm16", action="store_true",
        help="ship frames to the device as int16 PCM (halved H2D bytes; "
        "bit-exact for 16-bit wav uploads)",
    )
    parser.add_argument(
        "--chunk", type=int, default=None,
        help="scan the model forward over microbatches of this size "
        "inside each dispatch (default: auto — 32 for the AST, whole "
        "batch otherwise; 0 forces whole-batch)",
    )
    args = parser.parse_args(argv)
    service = service_from_snapshot(
        args.snapshot,
        norm=args.norm,
        mean=args.mean,
        std=args.std,
        batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms,
        int8=args.int8,
        calibrate=args.calibrate,
        use_pallas=args.use_pallas,
        output=args.output,
        pcm16=args.pcm16,
        chunk=args.chunk,
    )
    with service:
        service.serve(args.host, args.port)


if __name__ == "__main__":
    main()
