"""Jitted train / eval steps: transform + model + loss + optimizer in one jit.

The reference splits a training step across torch modules (transform under
no_grad, normalize, forward, backward, Adam step — reference:
src/audiofakedetect/train_classifier.py:945-995, each a separate kernel
launch chain).  Here the entire step is a single compiled XLA program.  With
the batch sharded over the mesh's ``data`` axis and parameters replicated:

* gradients sync automatically (XLA inserts the ``psum``),
* batch-norm moments are global batch statistics (== SyncBatchNorm),
* eval statistics reduce globally.

Optimizer parity: torch ``Adam(lr, weight_decay=wd)`` applies L2 *into the
gradient* before the moment updates — i.e. ``add_decayed_weights`` ahead of
``scale_by_adam`` (NOT decoupled AdamW decay).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.audio import augment

MAX_LABELS = 32  # dense per-label metric vector size (labels are A..N -> <14)


def audio_to_float(audio: jnp.ndarray) -> jnp.ndarray:
    """Accept float audio or raw int16 PCM (scale 1/32768) batches.

    Loaders may ship int16 to halve host traffic and H2D bytes
    (data/loader.py ``emit="int16"``); inside the jitted step XLA fuses
    this conversion into the transform's first op for free.
    """
    if jnp.issubdtype(audio.dtype, jnp.integer):
        return audio.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    return audio


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def make_optimizer(
    learning_rate: float,
    weight_decay: float,
    moment_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) equivalent (L2-in-gradient).

    ``moment_dtype`` (e.g. ``jnp.bfloat16`` / ``"bfloat16"``) stores both
    Adam moments in that dtype — halves optimizer-state HBM (and its
    read+write traffic every step, the dominant per-step cost for
    bandwidth-bound models like the 86M-param AST) at the price of ~8-bit
    moment mantissas.  ``None`` (default) keeps fp32 moments: the exact
    torch-Adam trajectory-parity contract (tests/test_train_parity.py).
    """
    if moment_dtype is not None and jnp.dtype(moment_dtype) == jnp.float32:
        moment_dtype = None  # explicit "float32" == the exact default path
    if moment_dtype is None:
        adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    else:
        adam = scale_by_adam_lowp(
            b1=0.9, b2=0.999, eps=1e-8, moment_dtype=jnp.dtype(moment_dtype)
        )
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        adam,
        optax.scale(-learning_rate),
    )


def scale_by_adam_lowp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: Any = jnp.bfloat16,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with BOTH moments *stored* low-precision.

    optax's own ``mu_dtype`` downcasts only the first moment; the second
    moment (the bigger numerical risk, but also half the remaining state)
    stays fp32.  Here both are stored in ``moment_dtype`` and every step
    computes in fp32 *from the rounded stored values*:

        m' = round(b1*m + (1-b1)*g);  update = mhat'/(sqrt(vhat') + eps)

    Computing the update from the already-rounded ``m'``/``v'`` (instead of
    the pre-rounding fp32 accumulators) makes the trajectory a pure function
    of the stored state — a checkpoint/restore cycle is bit-invisible, which
    keeps ``--resume`` exact (train/trainer.py restore path).

    bf16 carries fp32's exponent range with an 8-bit mantissa: moments see
    ~0.4% relative rounding noise, ~0.2% after the sqrt on ``nu`` — well
    under Adam's own gradient noise (A/B'd on the AST in docs/benchmarks.md).
    """
    moment_dtype = jnp.dtype(moment_dtype)

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), dtype=moment_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        c1 = 1.0 - jnp.power(jnp.float32(b1), count.astype(jnp.float32))
        c2 = 1.0 - jnp.power(jnp.float32(b2), count.astype(jnp.float32))

        def next_mu(g, m):
            g32 = g.astype(jnp.float32)
            return (b1 * m.astype(jnp.float32) + (1.0 - b1) * g32).astype(
                moment_dtype
            )

        def next_nu(g, v):
            g32 = g.astype(jnp.float32)
            return (
                b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            ).astype(moment_dtype)

        mu = jax.tree.map(next_mu, updates, state.mu)
        nu = jax.tree.map(next_nu, updates, state.nu)

        def direction(m, v):
            mhat = m.astype(jnp.float32) / c1
            vhat = v.astype(jnp.float32) / c2
            return mhat / (jnp.sqrt(vhat) + eps)

        new_updates = jax.tree.map(direction, mu, nu)
        return new_updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    example_image: jnp.ndarray,
    seed: int = 0,
    variables: Optional[Dict[str, Any]] = None,
) -> TrainState:
    rng = jax.random.key(seed)
    if variables is None:
        init_rng, rng = jax.random.split(rng)
        variables = model.init(init_rng, example_image, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


def make_train_step(
    model,
    transform: Callable[[jnp.ndarray], jnp.ndarray],
    tx: optax.GradientTransformation,
    aug_contrast: bool = False,
    aug_noise: bool = False,
    grad_accum: int = 1,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the fused train step (donated state; jit once per config)."""
    return jax.jit(
        _train_step_body(
            model, transform, tx, aug_contrast, aug_noise, grad_accum
        ),
        donate_argnums=(0,),
    )


def _train_step_body(
    model,
    transform: Callable[[jnp.ndarray], jnp.ndarray],
    tx: optax.GradientTransformation,
    aug_contrast: bool = False,
    aug_noise: bool = False,
    grad_accum: int = 1,
):
    def loss_fn(params, batch_stats, image, labels, dropout_rng):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            image,
            train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out, labels
        ).mean()
        return loss, (out, updates["batch_stats"])

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, aug_rng, dropout_rng = jax.random.split(state.rng, 3)
        audio = audio_to_float(batch["audio"])
        labels = (batch["label"] != 0).astype(jnp.int32)
        if aug_contrast or aug_noise:
            audio = augment(aug_rng, audio, aug_contrast, aug_noise)
        image = jax.lax.stop_gradient(transform(audio))

        if grad_accum <= 1:
            (loss, (out, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, image, labels, dropout_rng
            )
            acc = jnp.mean(
                (jnp.argmax(out, -1) == labels).astype(jnp.float32)
            )
        else:
            # Gradient accumulation: scan over A microbatches so only one
            # microbatch's activations are ever live — activation memory
            # (and XLA's large-batch VMEM pressure, see the AST b128
            # anomaly in docs/benchmarks.md) scales with B/A while the
            # optimizer sees the full-batch mean gradient, bitwise the
            # mean of the microbatch gradients.  BatchNorm models
            # normalize with per-MICRObatch moments and update running
            # stats A times per step (same semantics as torch gradient
            # accumulation); LayerNorm models (AST) match the unaccumu-
            # lated step to fp32 roundoff (tests/test_grad_accum.py).
            b = image.shape[0]
            if b % grad_accum:
                raise ValueError(
                    f"batch {b} not divisible by grad_accum {grad_accum}"
                )
            mb = b // grad_accum
            image_r = image.reshape((grad_accum, mb) + image.shape[1:])
            labels_r = labels.reshape((grad_accum, mb))
            zero_grads = jax.tree.map(jnp.zeros_like, state.params)

            def micro(carry, xs):
                grads_sum, stats, loss_sum, correct = carry
                img_mb, lab_mb, i = xs
                (l, (out, stats)), g = grad_fn(
                    state.params,
                    stats,
                    img_mb,
                    lab_mb,
                    jax.random.fold_in(dropout_rng, i),
                )
                grads_sum = jax.tree.map(jnp.add, grads_sum, g)
                correct = correct + jnp.sum(
                    (jnp.argmax(out, -1) == lab_mb).astype(jnp.float32)
                )
                return (grads_sum, stats, loss_sum + l, correct), None

            (grads_sum, new_stats, loss_sum, correct), _ = jax.lax.scan(
                micro,
                (zero_grads, state.batch_stats, jnp.float32(0.0), jnp.float32(0.0)),
                (image_r, labels_r, jnp.arange(grad_accum)),
            )
            inv = jnp.float32(1.0 / grad_accum)
            grads = jax.tree.map(lambda g: g * inv, grads_sum)
            loss = loss_sum * inv
            acc = correct / jnp.float32(b)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, {"loss": loss, "acc": acc}

    return train_step


def make_multi_train_step(
    model,
    transform: Callable[[jnp.ndarray], jnp.ndarray],
    tx: optax.GradientTransformation,
    aug_contrast: bool = False,
    aug_noise: bool = False,
    grad_accum: int = 1,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """G sequential optimizer steps in ONE dispatch (``lax.scan``).

    The batch pytree carries a leading superbatch axis ``[G, B, ...]``; the
    scan consumes one batch per iteration, so gradients / Adam updates / BN
    running stats evolve exactly as G separate calls would.  Returned stats
    are stacked ``[G]``.  Use when per-dispatch latency dominates (the TPU
    relay in this environment costs ~100 ms per fresh-input dispatch;
    multi-host setups amortize the same way).  Reference counterpart: the
    per-batch torch loop, train_classifier.py:910-912 — there is no torch
    equivalent of executing the loop on device.
    """
    body = _train_step_body(
        model, transform, tx, aug_contrast, aug_noise, grad_accum
    )

    def multi_step(state: TrainState, batches: Dict[str, jnp.ndarray]):
        return jax.lax.scan(body, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,))


def make_resident_multi_train_step(
    model,
    transform: Callable[[jnp.ndarray], jnp.ndarray],
    tx: optax.GradientTransformation,
    mesh=None,
    aug_contrast: bool = False,
    aug_noise: bool = False,
    grad_accum: int = 1,
) -> Callable[..., Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """G optimizer steps per dispatch over DEVICE-RESIDENT training data.

    Signature: ``(state, audio_all, labels_all, idx) -> (state, stats)``
    with ``audio_all [N, 1, T]`` / ``labels_all [N]`` living in HBM (see
    train/device_data.py) and ``idx [G, B]`` int32 frame indices — the only
    per-dispatch H2D traffic.  Each scan iteration gathers its batch from
    the resident tensor and runs the exact :func:`_train_step_body` the
    streaming path uses, so the math (grad/Adam/BN-stat evolution, PRNG
    stream) is identical to G separate host-fed steps.

    The reference re-uploads every batch every epoch (per-batch ``.to``,
    train_classifier.py:910-952); there is no torch equivalent of an epoch
    that never touches the host.  With a 'data'-sharded ``idx`` and
    replicated ``audio_all``, XLA partitions the gather so each device
    materializes only its batch shard.
    """
    body = _train_step_body(
        model, transform, tx, aug_contrast, aug_noise, grad_accum
    )
    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        audio_sharding = batch_sharding(mesh, 3)
        label_sharding = batch_sharding(mesh, 1)

    def multi_step(state: TrainState, audio_all, labels_all, idx):
        def step(st, batch_idx):
            audio = jnp.take(audio_all, batch_idx, axis=0)
            labels = jnp.take(labels_all, batch_idx, axis=0)
            if mesh is not None:
                audio = jax.lax.with_sharding_constraint(
                    audio, audio_sharding
                )
                labels = jax.lax.with_sharding_constraint(
                    labels, label_sharding
                )
            return body(st, {"audio": audio, "label": labels})

        return jax.lax.scan(step, state, idx)

    # donate only the state: audio_all/labels_all are reused every dispatch
    return jax.jit(multi_step, donate_argnums=(0,))


def stack_batches(batches):
    """Stack a list of same-shape host batches into one ``[G, ...]`` pytree."""
    import numpy as np

    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def make_eval_step(
    model,
    transform: Callable[[jnp.ndarray], jnp.ndarray],
) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Build the fused eval step.

    Per-label statistics are dense ``[MAX_LABELS]`` count vectors (instead of
    the reference's Python dicts + ``all_gather_object``,
    train_classifier.py:453-459) so everything stays a tensor reduction that
    works identically on one chip or a full mesh.  ``weight`` masks padded
    tail entries of the final partial batch.
    """

    return jax.jit(_eval_step_body(model, transform))


def _eval_step_body(model, transform):
    def eval_step(params, batch_stats, batch):
        audio = audio_to_float(batch["audio"])
        labels = batch["label"].astype(jnp.int32)
        weight = batch.get("weight")
        if weight is None:
            weight = jnp.ones(labels.shape, jnp.float32)
        image = transform(audio)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, image, train=False
        )
        out_max = jnp.argmax(out, -1)
        y = (labels != 0).astype(jnp.int32)
        ok = (out_max == y).astype(jnp.float32) * weight
        onehot = jax.nn.one_hot(labels, MAX_LABELS, dtype=jnp.float32)
        onehot = onehot * weight[:, None]
        return {
            "ok_per_label": jnp.sum(onehot * ok[:, None], axis=0),
            "count_per_label": jnp.sum(onehot, axis=0),
            "ok_sum": jnp.sum(ok),
            "total": jnp.sum(weight),
            "y": y,
            "out_max": out_max,
            "scores": jax.nn.softmax(out, axis=-1)[:, 1],
            "ok_mask": ok > 0,
        }

    return eval_step


def make_resident_multi_eval_step(
    model,
    transform: Callable[[jnp.ndarray], jnp.ndarray],
    mesh=None,
) -> Callable[..., Dict[str, jnp.ndarray]]:
    """A whole eval pass per dispatch over DEVICE-RESIDENT data.

    Signature: ``(params, batch_stats, audio_all, labels_all, idx)`` with
    ``idx [n_batches, B]`` int32; ``-1`` entries are tail-padding sentinels
    that become zero-weight rows (gather index clamped to 0, every metric
    contribution masked — the host re-masks row outputs by the same
    ``idx >= 0`` predicate).  Because eval has no sequential dependency the
    scan covers the ENTIRE loader in one dispatch: through a high-latency
    host link (the dev relay, any remote pod controller) a full validation
    pass costs one submission instead of one per batch — and the repeated
    per-``validation_interval`` re-upload of the same eval set disappears
    with it.  Results stack ``[n_batches, ...]`` exactly like
    :func:`make_multi_eval_step`.
    """
    body = _eval_step_body(model, transform)
    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        audio_sharding = batch_sharding(mesh, 3)
        label_sharding = batch_sharding(mesh, 1)

    def multi_eval(params, batch_stats, audio_all, labels_all, idx):
        def step(carry, batch_idx):
            valid = batch_idx >= 0
            safe = jnp.maximum(batch_idx, 0)
            audio = jnp.take(audio_all, safe, axis=0)
            labels = jnp.take(labels_all, safe, axis=0)
            if mesh is not None:
                audio = jax.lax.with_sharding_constraint(
                    audio, audio_sharding
                )
                labels = jax.lax.with_sharding_constraint(
                    labels, label_sharding
                )
            batch = {
                "audio": audio,
                "label": labels,
                "weight": valid.astype(jnp.float32),
            }
            return carry, body(params, batch_stats, batch)

        _, stacked = jax.lax.scan(step, 0, idx)
        return stacked

    return jax.jit(multi_eval)


def make_multi_eval_step(
    model,
    transform: Callable[[jnp.ndarray], jnp.ndarray],
) -> Callable[..., Dict[str, jnp.ndarray]]:
    """G eval batches in ONE dispatch (``lax.scan``); results stack [G, ...].

    The eval-side twin of :func:`make_multi_train_step` — for serving/eval
    paths where per-dispatch latency dominates the 3.5 ms eval step.
    """
    body = _eval_step_body(model, transform)

    def multi_eval(params, batch_stats, batches):
        def step(carry, batch):
            return carry, body(params, batch_stats, batch)

        _, stacked = jax.lax.scan(step, 0, batches)
        return stacked

    return jax.jit(multi_eval)
