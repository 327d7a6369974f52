"""Portable serving artifacts via ``jax.export`` (serialized StableHLO).

The reference has no deployment story: its only inference path is
``--only-testing`` inside the full training driver (reference:
src/audiofakedetect/train_classifier.py:1311-1323), which needs the whole
Python package, the dataset machinery and a prepared ``.npy`` index.  For
production serving this module exports the complete jitted scoring
function — time-frequency transform, normalization, model forward and
softmax — as one serialized StableHLO module: a self-contained artifact
(the imported weights are captured as constants) that a later JAX, or any
PjRT-based C++ host, can load and call with a raw audio batch, without
this package's model code or the ``.pt`` snapshot.

Artifact format (single file)::

    ADFX1\\n                       magic + version
    <json meta>\\n                 shapes, dtype, platforms, win, source
    <jax.export serialized bytes>  the StableHLO module

Portability contract: with ``--xla-wpt`` (forced automatically for
symbolic-batch or multi-platform exports) the module contains only
standard StableHLO ops, so it runs on any backend.  A TPU-only export may
instead embed the fused Mosaic WPT kernel (a ``tpu_custom_call``), which
is faster (docs/benchmarks.md: 0.02-0.09 ms vs 3.4 ms per batch-128
transform) but ties the artifact to a compatible libtpu — jax.export
flags that call as a non-guaranteed-stable custom call, which we
acknowledge with an explicit ``DisabledSafetyCheck``.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from .predict import make_score_fn

_MAGIC = b"ADFX1\n"


def export_scorer(
    model,
    transform: Callable,
    variables,
    win: int,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    allow_tpu_custom_calls: bool = False,
    chunk: int = 0,
) -> jexport.Exported:
    """Export the jitted ``[B, 1, win] audio -> [B] P(fake)`` scorer.

    ``batch_size=None`` exports with a symbolic batch dimension (the
    artifact then serves any batch size); this requires the transform to
    avoid Mosaic kernels, whose grids need concrete shapes — build it
    with ``use_pallas=False``.

    ``chunk``: bake the microbatched-scan forward into the artifact
    (the AST large-batch VMEM knee, docs/benchmarks.md "AST serving
    batch knee").  Requires a concrete ``batch_size`` — a symbolic batch
    dimension cannot prove the divisibility the scan needs.
    """
    if chunk and batch_size is None:
        raise ValueError(
            "chunk requires a concrete batch_size: a symbolic batch "
            "dimension cannot prove the b % chunk == 0 the in-dispatch "
            "scan needs"
        )
    score = make_score_fn(
        model, transform, variables, closed=True, chunk=chunk
    )
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        arg = jax.ShapeDtypeStruct((b, 1, win), jnp.float32)
    else:
        arg = jax.ShapeDtypeStruct((batch_size, 1, win), jnp.float32)
    checks = []
    if allow_tpu_custom_calls:
        checks.append(jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"))
    kwargs: dict = {"disabled_checks": tuple(checks)}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(score, **kwargs)(arg)


def save_artifact(exported: jexport.Exported, path: str, meta: dict) -> None:
    """Write the single-file serving artifact (header + StableHLO bytes)."""
    meta = dict(meta)
    meta.setdefault("platforms", list(exported.platforms))
    meta.setdefault(
        "in_shape", [str(d) for d in exported.in_avals[0].shape]
    )
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(json.dumps(meta).encode() + b"\n")
        fh.write(exported.serialize())


def load_artifact(path: str) -> tuple[jexport.Exported, dict]:
    """Load a serving artifact: ``(exported, meta)``; call via
    ``exported.call(audio)``."""
    with open(path, "rb") as fh:
        magic = fh.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an ADFX serving artifact")
        meta = json.loads(fh.readline().decode())
        exported = jexport.deserialize(fh.read())
    return exported, meta


def main(argv=None) -> None:
    """CLI: ``.pt`` snapshot -> self-contained serving artifact.

    Example::

        python -m audiodeepfake_detection_tpu.train.export \\
            model_packetssym5_..._0.pt detector.adfx \\
            --norm packets_..._mean_std.pkl --batch-size 128 --check
    """
    import argparse

    from .predict import build_scorer_from_snapshot

    parser = argparse.ArgumentParser(
        description="Export a snapshot as a portable StableHLO scorer"
    )
    parser.add_argument("snapshot", help=".pt snapshot (config-encoded name)")
    parser.add_argument("output", help="artifact path (e.g. detector.adfx)")
    parser.add_argument(
        "--batch-size", type=int, default=None,
        help="concrete serving batch; default: symbolic (any batch)",
    )
    parser.add_argument(
        "--platforms", default=None,
        help="comma-separated lowering platforms (e.g. tpu,cpu); "
        "default: the current backend",
    )
    parser.add_argument(
        "--norm", default=None, help="*_mean_std.pkl from training"
    )
    parser.add_argument("--mean", type=float, nargs="+", default=None)
    parser.add_argument("--std", type=float, nargs="+", default=None)
    parser.add_argument(
        "--no-log-scale", action="store_true",
        help="snapshot was trained without log scaling (not filename-encoded)",
    )
    parser.add_argument(
        "--xla-wpt", action="store_true",
        help="force the pure-StableHLO WPT cascade (portable artifact; "
        "automatic for symbolic batch or multi-platform exports)",
    )
    parser.add_argument(
        "--check", action="store_true",
        help="reload the artifact and score a random batch against the "
        "in-process scorer",
    )
    parser.add_argument(
        "--chunk", type=int, default=0,
        help="bake a microbatched-scan forward into the artifact "
        "(AST + large concrete batches; requires --batch-size)",
    )
    args = parser.parse_args(argv)

    platforms = args.platforms.split(",") if args.platforms else None
    # Mosaic kernels need a concrete grid and only lower on TPU: symbolic
    # or multi-platform exports must take the XLA cascade path.
    portable = (
        args.xla_wpt
        or args.batch_size is None
        or (platforms is not None and list(platforms) != ["tpu"])
    )
    model, transform, variables, cfg = build_scorer_from_snapshot(
        args.snapshot,
        norm=args.norm,
        mean=args.mean,
        std=args.std,
        log_scale=not args.no_log_scale,
        use_pallas=False if portable else None,
    )
    win = int(float(cfg.seconds) * int(cfg.sample_rate))
    exported = export_scorer(
        model,
        transform,
        variables,
        win,
        batch_size=args.batch_size,
        platforms=platforms,
        allow_tpu_custom_calls=not portable,
        chunk=args.chunk,
    )
    save_artifact(
        exported,
        args.output,
        {
            "snapshot": args.snapshot,
            "model": cfg.model_name,
            "transform": cfg.transform,
            "win": win,
            "sample_rate": int(cfg.sample_rate),
            "portable": portable,
            "normalized": args.norm is not None or args.mean is not None,
            "chunk": args.chunk,
        },
    )
    # file size, not a second serialize(): the module embeds all weights
    # as constants, so re-serializing would double export time and memory
    import os

    size = os.path.getsize(args.output)
    print(f"wrote {args.output} ({size} bytes, platforms "
          f"{list(exported.platforms)}, input ["
          f"{', '.join(str(d) for d in exported.in_avals[0].shape)}])")

    if args.check:
        reloaded, meta = load_artifact(args.output)
        b = args.batch_size or 2
        rng = np.random.RandomState(0)
        audio = jnp.asarray(rng.randn(b, 1, win).astype(np.float32))
        got = np.asarray(reloaded.call(audio))
        want = np.asarray(
            make_score_fn(model, transform, variables, closed=True)(audio)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        print(f"check ok: artifact matches in-process scorer "
              f"(max |d| = {np.abs(got - want).max():.2e})")


if __name__ == "__main__":  # pragma: no cover
    main()
