"""Pipeline parallelism (GPipe-style SPMD) for the AST encoder.

The reference has no pipeline parallelism at all (SURVEY §2c: its only
strategy is DDP over NCCL, reference: src/audiofakedetect/
train_classifier.py:44-47,322) — its models are far too small to need it.
The AST path is the exception: base384 is a 12-block, 86M-param DeiT
(reference models.py:462-707), and on pods one may want its layers split
across chips.  On TPU the idiomatic formulation is *one program, one
collective*: the mesh gets a ``stage`` axis, every stage runs the same
jitted code on its ``depth/S`` stacked blocks, and activations circulate
stage→stage+1 with a single ``lax.ppermute`` per microbatch tick — the
classic SPMD pipeline from the JAX scaling playbook, not a torch-style
per-stage process group.

Schedule: GPipe.  ``M`` microbatches flow through ``S`` stages in
``M + S - 1`` ticks of a ``lax.scan``; stage 0 injects microbatch ``t``,
stage ``S-1`` collects microbatch ``t-(S-1)``, and the bubble is the
standard ``(S-1)/(M+S-1)`` fraction.  The collected buffer is broadcast
off the last stage with a masked ``psum``.  Everything is differentiable
(scan / ppermute / dynamic-update all have transposes), so ``jax.grad``
through the pipeline yields the exact backward schedule for free.

Composes with data parallelism: on a ``Mesh(('data','stage'))`` the token
batch stays sharded over ``data`` while blocks are sharded over ``stage``
— each data slice runs its own pipeline, gradients reduce over ``data``
via sharding propagation as usual.

Scope notes (documented, asserted where cheap):

* blocks run deterministically inside the pipeline (dropout/drop-path
  off).  The reference's timm-0.4.5 DeiT defaults are rate 0 everywhere
  (reference models.py:531-533), so training math matches the default
  configs exactly; stochastic-depth training is not available under PP.
* the microbatch staging buffer is replicated over ``stage`` (each stage
  holds the full token batch of its data slice) — the standard GPipe
  trade; activations in flight are what PP shrinks, not the input.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ast import _SIZES, _Block


def stack_block_params(params) -> Tuple[Any, int]:
    """Stack ``block_{i}`` subtrees along a new leading (depth) axis.

    Returns ``(stacked, depth)`` where every leaf of ``stacked`` has shape
    ``[depth, *leaf_shape]``.  The inverse (for checkpoint export) is a
    plain ``leaf[i]`` slice per block.
    """
    blocks = []
    while f"block_{len(blocks)}" in params:
        blocks.append(params[f"block_{len(blocks)}"])
    if not blocks:
        raise ValueError("no block_{i} subtrees found in params")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return stacked, len(blocks)


def _block_applier(model):
    """A single-`_Block` apply fn usable under scan over stacked params."""
    cfg = _SIZES[model.model_size]
    blk = _Block(
        cfg["embed_dim"],
        cfg["num_heads"],
        drop_rate=model.drop_rate,
        attn_drop_rate=model.attn_drop_rate,
        drop_path_rate=0.0,  # deterministic inside the pipeline (see module doc)
        dtype=model.dtype,
        precision=model.precision,
    )

    def apply_block(p, x):
        return blk.apply({"params": p}, x, train=False)

    return apply_block


def pipeline_encode(
    model,
    stacked_blocks,
    tokens: jnp.ndarray,
    mesh: Mesh,
    n_microbatches: int,
    stage_axis: str = "stage",
    data_axis: str | None = None,
) -> jnp.ndarray:
    """Run the AST encoder as an S-stage GPipe pipeline over ``mesh``.

    ``tokens``: ``[B, N, D]`` embedded tokens (post pos-embed).
    ``stacked_blocks``: pytree with leading depth axis (see
    :func:`stack_block_params`); depth must divide evenly into
    ``mesh.shape[stage_axis]`` stages.
    """
    n_stages = mesh.shape[stage_axis]
    apply_block = _block_applier(model)

    batch = tokens.shape[0]
    # divisibility holds PER DATA SHARD: inside shard_map each data slice
    # carries batch / mesh[data_axis] rows, and those must split into
    # n_microbatches (a global-batch check would pass and then fail with a
    # cryptic reshape error at trace time inside shard_map)
    data_n = mesh.shape[data_axis] if data_axis else 1
    if batch % data_n:
        raise ValueError(
            f"batch {batch} not divisible by data axis {data_n}"
        )
    if (batch // data_n) % n_microbatches:
        raise ValueError(
            f"per-shard batch {batch // data_n} (= {batch} / data {data_n}) "
            f"not divisible by n_microbatches {n_microbatches}"
        )
    depth = jax.tree_util.tree_leaves(stacked_blocks)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")

    def run(local_blocks, h_loc):
        m = n_microbatches
        b_loc, n_tok, d = h_loc.shape
        mb = b_loc // m
        mbs = h_loc.reshape(m, mb, n_tok, d)
        state = jnp.zeros((mb, n_tok, d), h_loc.dtype)
        outbuf = jnp.zeros((m, mb, n_tok, d), h_loc.dtype)
        sid = jax.lax.axis_index(stage_axis)

        def tick(carry, t):
            state, outbuf = carry
            # stage 0 injects microbatch t (clamped; post-M injections
            # never reach the collector, see out_idx range below)
            inj = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            state = jnp.where(sid == 0, inj, state)
            state = jax.lax.scan(
                lambda x, p: (apply_block(p, x), None), state, local_blocks
            )[0]
            # stage S-1 holds microbatch t-(S-1) now; collect it
            out_idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            collect = jnp.logical_and(sid == n_stages - 1, t >= n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(
                outbuf, out_idx, 0, keepdims=False
            )
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(collect, state, cur), out_idx, 0
            )
            state = jax.lax.ppermute(
                state,
                stage_axis,
                [(s, (s + 1) % n_stages) for s in range(n_stages)],
            )
            return (state, outbuf), None

        (state, outbuf), _ = jax.lax.scan(
            tick, (state, outbuf), jnp.arange(m + n_stages - 1)
        )
        # outbuf is only valid on the last stage; masked psum broadcasts it
        mask = (sid == n_stages - 1).astype(outbuf.dtype)
        outbuf = jax.lax.psum(outbuf * mask, stage_axis)
        return outbuf.reshape(b_loc, n_tok, d)

    tok_spec = P(data_axis) if data_axis else P()
    fn = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(stage_axis), tok_spec),
        out_specs=tok_spec,
        check_vma=False,
    )
    return fn(stacked_blocks, tokens)


def pp_ast_logits(
    model,
    params,
    x: jnp.ndarray,
    mesh: Mesh,
    n_microbatches: int,
    stage_axis: str = "stage",
    data_axis: str | None = None,
) -> jnp.ndarray:
    """Full AST forward with the encoder pipelined (pure; jit/grad-safe).

    Embed and classify are tiny (one conv / two norms + head) and run
    replicated over ``stage`` via ordinary sharding propagation; only the
    86M-param block stack is pipelined.  Takes the *original* (unstacked)
    param tree so gradients land in the checkpoint layout — the stack is
    re-formed inside the traced function and pinned to the stage-sharded
    layout, so each stage materializes only its own blocks.
    """
    variables = {"params": params}
    h = model.apply(variables, x, method="embed")
    stacked, _ = stack_block_params(params)
    stacked = jax.tree.map(
        lambda leaf: jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, P(stage_axis))
        ),
        stacked,
    )
    h = pipeline_encode(
        model, stacked, h, mesh, n_microbatches, stage_axis, data_axis
    )
    return model.apply(variables, h, method="classify")


def _pp_trainer_step_body(
    model,
    transform,
    tx,
    mesh: Mesh,
    n_microbatches: int,
    stage_axis: str = "stage",
    data_axis: str = "data",
    aug_contrast: bool = False,
    aug_noise: bool = False,
):
    """Trainer-compatible step body: audio batches in, ``TrainState`` out.

    The ``TrainState`` twin of :func:`make_pp_train_step` — same transform /
    augment / loss semantics as ``train.steps._train_step_body`` with the
    encoder pipelined over ``stage_axis``.  Params live in the ordinary
    (replicated) checkpoint layout at rest; the stage-sharded block stack is
    formed inside the traced function (see :func:`pp_ast_logits`), so the
    Trainer's snapshot / eval / import machinery needs no PP awareness.
    AST has no batch-norm state, so ``batch_stats`` passes through.
    """
    import optax

    from ..ops.audio import augment
    from ..train.steps import TrainState, audio_to_float

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, aug_rng = jax.random.split(state.rng)
        audio = audio_to_float(batch["audio"])
        labels = (batch["label"] != 0).astype(jnp.int32)
        if aug_contrast or aug_noise:
            audio = augment(aug_rng, audio, aug_contrast, aug_noise)
        image = jax.lax.stop_gradient(transform(audio))

        def loss_fn(p):
            out = pp_ast_logits(
                model, p, image, mesh, n_microbatches, stage_axis, data_axis
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out, labels
            ).mean()
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(out, -1) == labels).astype(jnp.float32))
        new_state = TrainState(
            params=params,
            batch_stats=state.batch_stats,
            opt_state=opt_state,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_pp_trainer_step(
    model,
    transform,
    tx,
    mesh: Mesh,
    n_microbatches: int,
    stage_axis: str = "stage",
    data_axis: str = "data",
    aug_contrast: bool = False,
    aug_noise: bool = False,
):
    """Jitted Trainer-compatible PP train step (see the body docstring)."""
    return jax.jit(
        _pp_trainer_step_body(
            model, transform, tx, mesh, n_microbatches,
            stage_axis, data_axis, aug_contrast, aug_noise,
        ),
        donate_argnums=(0,),
    )


def make_pp_multi_trainer_step(
    model,
    transform,
    tx,
    mesh: Mesh,
    n_microbatches: int,
    stage_axis: str = "stage",
    data_axis: str = "data",
    aug_contrast: bool = False,
    aug_noise: bool = False,
):
    """G chained PP steps per dispatch (``steps_per_call>1`` in the Trainer)."""
    body = _pp_trainer_step_body(
        model, transform, tx, mesh, n_microbatches,
        stage_axis, data_axis, aug_contrast, aug_noise,
    )

    def multi_step(state, batches):
        return jax.lax.scan(body, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,))


def make_pp_train_step(
    model,
    tx,
    mesh: Mesh,
    n_microbatches: int,
    stage_axis: str = "stage",
    data_axis: str | None = None,
):
    """CE-loss train step over the pipelined AST (params, opt_state, step).

    Same loss/optimizer semantics as ``train.steps`` (softmax CE on binary
    collapsed labels, torch-Adam L2 via the caller's ``tx``); AST has no
    batch-norm state so the carried state is just (params, opt_state,
    step).  Batches arrive as transformed images ``[B, 1, F, T]``.
    """
    import optax

    def step(state, batch: Dict[str, jnp.ndarray]):
        params, opt_state, n = state
        labels = (batch["label"] != 0).astype(jnp.int32)

        def loss_fn(p):
            out = pp_ast_logits(
                model,
                p,
                batch["image"],
                mesh,
                n_microbatches,
                stage_axis,
                data_axis,
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out, labels
            ).mean()
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((jnp.argmax(out, -1) == labels).astype(jnp.float32))
        return (params, opt_state, n + 1), {"loss": loss, "acc": acc}

    return jax.jit(step, donate_argnums=(0,))
