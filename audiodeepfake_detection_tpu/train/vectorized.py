"""Grid-vectorized training: all sweep seeds in ONE compiled program.

The reference's headline workflow is a grid search whose results aggregate
over 5 seeds (reference: src/audiofakedetect/utils.py:505-513 prepends the
seed list as a grid axis; README.md:124-126), and it trains those seeds
strictly serially — one full run per seed.  On TPU the seed axis is just
another batch dimension: ``jax.vmap`` over the train step turns S
independent seed runs into one jitted program whose every HLO op carries a
leading ``[S]`` axis.  There is no torch counterpart of this transform —
it is the functional-JAX way to run an experiment sweep.

Why it pays off:

* **Dispatch amortization** — the dominant cost of small-model training in
  this environment is the host->device round trip (~85 ms through the TPU
  relay), already amortized G× by the ``lax.scan``-chained multi-step
  (train/steps.py).  Vectorizing seeds multiplies the work per dispatch by
  S on top: one dispatch advances S seeds × G optimizer steps.
* **Utilization** — the DCNN family is small (~240k params); at small
  batch sizes the per-op tails underfill the VPU/MXU.  The seed axis
  multiplies arithmetic intensity without touching batch semantics.

Semantics are EXACTLY the serial runs': every seed keeps its own params,
optimizer moments, batch-norm running stats, PRNG stream, and its own
data order (each seed's loader shuffles with its own seed, matching the
serial grid).  ``tests/test_vectorized.py`` locks the vectorized states
against S independent serial runs.

Batch layout: train batches stack per-seed streams as ``[S, B, ...]``
(``[G, S, B, ...]`` for the scan-chained variant); eval shares one batch
across seeds (``in_axes=(0, 0, None)``) because eval order is
deterministic and identical for every seed.

Seed-axis modes: ``seed_axis="vmap"`` (default) batches every HLO op with
a leading ``[S]`` axis — best VPU/MXU utilization for small models, but
activation memory scales with S and ``shard_map`` (the fused Pallas
kernels' dispatch, ops/fused_conv1.py) has no vmap batching rule.
``seed_axis="scan"`` runs the seed axis as a ``lax.map`` INSIDE the same
jitted program: identical per-seed numerics, identical dispatch
amortization (one host round trip still advances S seeds × G steps), the
fused kernels run at full Pallas speed per seed, and activations do NOT
scale with S (only params/optimizer state stay ``[S]``-stacked).  The
sweep runner (``train/sweep.py``) picks "scan" automatically when the
model uses fused kernels.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .steps import TrainState, _eval_step_body, _train_step_body, make_optimizer

__all__ = [
    "create_vectorized_state",
    "make_hyper_optimizer",
    "make_vectorized_train_step",
    "make_vectorized_multi_train_step",
    "make_vectorized_eval_step",
    "state_for_seed",
    "stack_seed_states",
    "multi_seed_epoch",
]


def make_hyper_optimizer(
    learning_rate: float, weight_decay: float
) -> optax.GradientTransformation:
    """:func:`steps.make_optimizer` with lr/wd as OPTIMIZER STATE.

    ``optax.inject_hyperparams`` moves the two scalars out of the closure
    and into ``opt_state.hyperparams`` — under ``vmap`` each grid slice
    then carries its own values, so a vectorized program can train
    configurations that differ in learning rate / weight decay, not just
    seed (the reference grids over lr lists serially,
    gridsearch_config.py + train_classifier.py:1147).  The update math is
    the unchanged torch-Adam-parity chain.
    """
    return optax.inject_hyperparams(make_optimizer)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )


def _check_seed_axis(seed_axis: str) -> None:
    if seed_axis not in ("vmap", "scan"):
        raise ValueError(
            f"seed_axis must be 'vmap' or 'scan', got {seed_axis!r}"
        )


def _seed_mapped(body):
    """``lax.map`` over the seed axis: vmap semantics, sequential execution.

    For models whose forward dispatches shard_map'd Pallas kernels: shard
    map has no batching rule, so ``vmap`` cannot add the seed axis — but a
    ``lax.map`` body traces the kernel once and runs it S times inside the
    SAME jitted program.
    """

    def mapped(vstate: TrainState, vbatch):
        return jax.lax.map(lambda sb: body(sb[0], sb[1]), (vstate, vbatch))

    return mapped


def create_vectorized_state(
    model,
    tx: optax.GradientTransformation,
    example_image: jnp.ndarray,
    seeds: Sequence[int],
    hyperparams: Dict[str, Sequence[float]] = None,
    seed_axis: str = "vmap",
) -> TrainState:
    """A ``TrainState`` whose every leaf carries a leading ``[S]`` seed axis.

    Each seed initializes exactly as :func:`steps.create_train_state` with
    that seed would (same key split, same init distribution draws), so
    ``state_for_seed(vstate, i)`` equals the serial init for ``seeds[i]``.

    ``hyperparams`` (requires a :func:`make_hyper_optimizer` ``tx``) gives
    per-slice optimizer scalars, e.g. ``{"learning_rate": [4e-4, 1e-3]}``
    — slice ``i`` then trains with its own lr/wd, so the vectorized
    program covers lr/wd grid axes, not just seeds.
    """
    keys = jnp.stack([jax.random.key(int(s)) for s in seeds])
    hp = {
        k: jnp.asarray(v, jnp.float32)
        for k, v in (hyperparams or {}).items()
    }
    for k, v in hp.items():
        if v.shape != (len(seeds),):
            raise ValueError(
                f"hyperparams[{k!r}] must have one value per seed "
                f"(got shape {v.shape} for {len(seeds)} seeds)"
            )

    def init_one(rng: jax.Array, hp_one: Dict[str, jnp.ndarray]) -> TrainState:
        init_rng, rng = jax.random.split(rng)
        variables = model.init(init_rng, example_image, train=False)
        params = variables["params"]
        opt_state = tx.init(params)
        if hp_one:
            if not hasattr(opt_state, "hyperparams"):
                raise ValueError(
                    "per-slice hyperparams need a make_hyper_optimizer tx "
                    "(optax.inject_hyperparams state)"
                )
            opt_state = opt_state._replace(
                hyperparams={**opt_state.hyperparams, **hp_one}
            )
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )

    _check_seed_axis(seed_axis)
    if seed_axis == "vmap":
        return jax.jit(jax.vmap(init_one))(keys, hp)
    return jax.jit(
        lambda k, h: jax.lax.map(lambda kh: init_one(kh[0], kh[1]), (k, h))
    )(keys, hp)


def state_for_seed(vstate: TrainState, i: int) -> TrainState:
    """Slice seed ``i`` out of a vectorized state (device-side gather)."""
    return jax.tree.map(lambda leaf: leaf[i], vstate)


def stack_seed_states(states: Sequence[TrainState]) -> TrainState:
    """Inverse of :func:`state_for_seed`: stack serial states along seed 0."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)


def make_vectorized_train_step(
    model,
    transform: Callable[[jnp.ndarray], jnp.ndarray],
    tx: optax.GradientTransformation,
    aug_contrast: bool = False,
    aug_noise: bool = False,
    seed_axis: str = "vmap",
    grad_accum: int = 1,
):
    """One optimizer step for ALL seeds: state ``[S]``-stacked, batch
    ``[S, B, ...]`` (per-seed data streams)."""
    _check_seed_axis(seed_axis)
    inner = _train_step_body(
        model, transform, tx, aug_contrast, aug_noise, grad_accum
    )
    body = jax.vmap(inner) if seed_axis == "vmap" else _seed_mapped(inner)
    return jax.jit(body, donate_argnums=(0,))


def make_vectorized_multi_train_step(
    model,
    transform: Callable[[jnp.ndarray], jnp.ndarray],
    tx: optax.GradientTransformation,
    aug_contrast: bool = False,
    aug_noise: bool = False,
    seed_axis: str = "vmap",
    grad_accum: int = 1,
):
    """G chained steps × S seeds per dispatch; batches ``[G, S, B, ...]``.

    The scan axis is OUTSIDE the seed axis: each tick advances every seed
    one step, so per-seed histories interleave exactly as G serial
    dispatches of :func:`make_vectorized_train_step` would.  Stats stack
    ``[G, S]``.
    """
    _check_seed_axis(seed_axis)
    inner = _train_step_body(
        model, transform, tx, aug_contrast, aug_noise, grad_accum
    )
    body = jax.vmap(inner) if seed_axis == "vmap" else _seed_mapped(inner)

    def multi_step(vstate: TrainState, batches: Dict[str, jnp.ndarray]):
        return jax.lax.scan(body, vstate, batches)

    return jax.jit(multi_step, donate_argnums=(0,))


def make_vectorized_eval_step(model, transform, seed_axis: str = "vmap"):
    """Evaluate ONE shared batch under every seed's params in one dispatch.

    Eval data order is deterministic and seed-independent, so the batch is
    broadcast (``in_axes=(0, 0, None)`` / closed over in scan mode) and
    every result field gains a leading ``[S]`` axis.
    """
    _check_seed_axis(seed_axis)
    inner = _eval_step_body(model, transform)
    if seed_axis == "vmap":
        body = jax.vmap(inner, in_axes=(0, 0, None))
    else:

        def body(params, batch_stats, batch):
            return jax.lax.map(
                lambda pb: inner(pb[0], pb[1], batch), (params, batch_stats)
            )

    return jax.jit(body)


def multi_seed_epoch(
    loaders: Sequence, epoch: int
) -> Iterator[Dict[str, np.ndarray]]:
    """Zip S per-seed loader epochs into ``[S, B, ...]`` stacked batches.

    Each loader carries its own shuffle seed, so stream ``i`` reproduces
    the data order of the serial run for ``seeds[i]``.  All loaders iterate
    the same dataset with the same batch size and ``drop_last``, so the
    streams are equal length by construction.
    """
    iters = [ld.epoch(epoch) for ld in loaders]
    while True:
        batches = []
        for it in iters:
            batches.append(next(it, None))
        stops = [b is None for b in batches]
        if all(stops):
            return
        if any(stops):  # pragma: no cover - loaders are same-length
            raise RuntimeError(
                "per-seed loaders yielded different batch counts"
            )
        yield jax.tree.map(lambda *xs: np.stack(xs), *batches)
