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
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, 1, 256, 101).astype(np.float32))
    # NB init happens inside create_train_state on the train path; doing it
    # here too would double the base384 init through the slow relay

    if args.train:
        import optax

        from audiodeepfake_detection_tpu.train.steps import (
            create_train_state,
            make_optimizer,
        )

        tx = make_optimizer(1e-5, 5e-7)
        state = create_train_state(model, tx, x, seed=0)
        labels = jnp.asarray(rng.randint(0, 2, args.batch))

        # Donate the state like the production step (train/steps.py
        # make_train_step donate_argnums=(0,)): without donation XLA
        # cannot update the 86M-param fp32 state in place and the step
        # pays fresh allocations + copies for params and both Adam
        # moments every call.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state):
            def loss_fn(p):
                out = model.apply(
                    {"params": p}, x, train=True,
                    rngs={"dropout": jax.random.key(1)},
                )
                return optax.softmax_cross_entropy_with_integer_labels(
                    out, labels
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state._replace(params=params, opt_state=opt_state), loss

        state, loss = step(state)
        float(loss)
        t0 = time.time()
        for _ in range(args.steps):
            state, loss = step(state)
        float(loss)
        dt = time.time() - t0
        what = "train step"
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
