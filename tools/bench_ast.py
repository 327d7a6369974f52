"""AST benchmark: base384 forward/train-step throughput on the local chip.

The reference's AST path (models.py:462-707, timm DeiT-distilled base384,
(256, 101) spectrogram input, stride 10 -> 25x9+2 tokens) has no published
speed numbers; this records ours.  Tensor-parallel (Megatron-style qkv/mlp
sharding, parallel/tensor.py) is validated on the virtual 8-device CPU mesh
in tests/test_parallel.py; on one physical chip only the single-chip number
is meaningful, so that is what this prints.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ast_train_setup(
    batch: int,
    size: str = "base384",
    fused_attention: bool = False,
    remat: bool = False,
    moments_dtype=None,
    grad_accum: int = 1,
    remat_policy=None,
):
    """Build (state, step) for the AST train step — shared with
    tools/profile_step.py's --ast trace mode.

    Routes through the production step body (train/steps.py
    _train_step_body: donated state, fused Adam update, optional
    microbatch scan / low-precision moments) so what is benchmarked here
    is exactly what the Trainer dispatches.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from audiodeepfake_detection_tpu.models.ast import ASTModel
    from audiodeepfake_detection_tpu.train.steps import (
        _train_step_body,
        create_train_state,
        make_optimizer,
    )

    model = ASTModel(
        model_size=size,
        dtype=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT,
        fused_attention=fused_attention,
        remat_blocks=remat,
        remat_policy=remat_policy,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 1, 256, 101).astype(np.float32))
    tx = make_optimizer(1e-5, 5e-7, moment_dtype=moments_dtype)
    state = create_train_state(model, tx, x, seed=0)
    # label 0 stays 0, nonzero collapses to 1 inside the body
    labels = jnp.asarray(rng.randint(0, 2, batch).astype(np.int32))
    batch_dict = {"audio": x, "label": labels}
    body = _train_step_body(model, lambda a: a, tx, grad_accum=grad_accum)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state):
        new_state, stats = body(state, batch_dict)
        return new_state, stats["loss"]

    return state, step


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", default="base384")
    ap.add_argument("--train", action="store_true", help="full train step")
    ap.add_argument(
        "--fused-attention", action="store_true",
        help="Pallas fused softmax(qk^T)v (ops/flash_attention.py)",
    )
    ap.add_argument(
        "--remat", action="store_true",
        help="rematerialize encoder blocks on backward (memory lever)",
    )
    ap.add_argument(
        "--bf16-moments", action="store_true",
        help="store Adam moments in bfloat16 (train/steps.py "
        "scale_by_adam_lowp) — halves optimizer-state traffic",
    )
    ap.add_argument(
        "--grad-accum", type=int, default=1,
        help="scan the step over N microbatches of batch/N "
        "(activation-memory / VMEM-pressure lever)",
    )
    ap.add_argument(
        "--remat-policy", default=None,
        help="named jax.checkpoint_policies selective-remat policy for "
        "the encoder blocks (e.g. dots_saveable); implies remat",
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

    model = ASTModel(
        model_size=args.size,
        dtype=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT,  # bf16 speed mode (parity
        # default is None -> HIGHEST, like DCNN/LCNN)
        fused_attention=args.fused_attention,
        remat_blocks=args.remat,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, 1, 256, 101).astype(np.float32))
    # NB init happens inside create_train_state on the train path; doing it
    # here too would double the base384 init through the slow relay

    if args.train:
        # Donated state like the production step (train/steps.py
        # make_train_step donate_argnums=(0,)): without donation XLA
        # cannot update the 86M-param fp32 state in place and the step
        # pays fresh allocations + copies for params and both Adam
        # moments every call.
        state, step = ast_train_setup(
            args.batch, args.size, args.fused_attention, args.remat,
            moments_dtype="bfloat16" if args.bf16_moments else None,
            grad_accum=args.grad_accum,
            remat_policy=args.remat_policy,
        )
        state, loss = step(state)
        float(loss)
        t0 = time.time()
        for _ in range(args.steps):
            state, loss = step(state)
        float(loss)
        dt = time.time() - t0
        what = "train step"
        # XLA cost model -> MFU / achieved HBM bandwidth (v5e peaks:
        # 197 TFLOP/s bf16, 819 GB/s); the per-op trace for the same step
        # comes from tools/profile_step.py
        try:
            ca = step.lower(state).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] or {}
            step_s = dt / args.steps
            flops = float(ca.get("flops", 0.0))
            xbytes = float(ca.get("bytes accessed", 0.0))
            if flops:
                print(
                    f"  cost model: {flops / 1e12:.2f} TFLOP/step, "
                    f"MFU {flops / step_s / 197e12:.3f}"
                )
            if xbytes:
                print(
                    f"  cost model: {xbytes / 1e9:.2f} GB/step, "
                    f"{xbytes / step_s / 1e9:.0f} GB/s "
                    f"({xbytes / step_s / 819e9:.2f} of HBM peak)"
                )
        except Exception as exc:
            print(f"  (cost analysis unavailable: {exc})")
    else:
        variables = model.init(jax.random.key(0), x)
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        np.asarray(fwd(variables, x))
        t0 = time.time()
        outs = []
        for _ in range(args.steps):
            outs.append(fwd(variables, x))
        jax.block_until_ready(outs[-1])
        dt = time.time() - t0
        what = "forward"

    fps = args.steps * args.batch / dt
    print(
        f"AST {args.size} {what}: batch {args.batch}, "
        f"{dt / args.steps * 1000:.2f} ms/step, {fps:.0f} frames/s/chip"
    )


if __name__ == "__main__":
    main()
