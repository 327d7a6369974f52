"""Low-precision Adam-moment storage (train/steps.py scale_by_adam_lowp).

The reference trains with fp32 torch Adam only (src/audiofakedetect/
train_classifier.py:1215-1219); bf16 moments are a beyond-reference
bandwidth/memory lever for the 86M-param AST.  Contract under test:

* bf16 moments track the fp32 Adam trajectory closely (rounding noise
  only, no drift blow-up over many steps);
* the stored state IS the trajectory: a checkpoint round-trip through
  host numpy is bit-invisible (exact ``--resume``);
* ``moment_dtype="float32"`` is byte-identical to the default exact path.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audiodeepfake_detection_tpu.train.steps import (  # noqa: E402
    make_optimizer,
    scale_by_adam_lowp,
)


def _params():
    rng = np.random.RandomState(0)
    return {
        "w": jnp.asarray(rng.randn(16, 8).astype(np.float32)),
        "b": jnp.asarray(rng.randn(8).astype(np.float32)),
    }


def _grad(params, step_rng):
    # synthetic but state-dependent gradients so trajectories can diverge
    return jax.tree.map(
        lambda p: 0.1 * p + jnp.asarray(step_rng.randn(*p.shape), jnp.float32),
        params,
    )


def _run(tx, n_steps, seed=1):
    import optax

    params = _params()
    state = tx.init(params)
    rng = np.random.RandomState(seed)
    for _ in range(n_steps):
        grads = _grad(params, rng)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


class TestLowpAdam:
    def test_moments_stored_bf16(self):
        tx = make_optimizer(1e-3, 1e-4, moment_dtype="bfloat16")
        state = tx.init(_params())
        adam_states = [
            s for s in jax.tree.leaves(state, is_leaf=lambda x: hasattr(x, "mu"))
            if hasattr(s, "mu")
        ]
        assert adam_states, "no ScaleByAdamState found in the chain"
        for s in adam_states:
            for leaf in jax.tree.leaves(s.mu) + jax.tree.leaves(s.nu):
                assert leaf.dtype == jnp.bfloat16

    def test_tracks_fp32_trajectory(self):
        n = 50
        p32, _ = _run(make_optimizer(1e-3, 1e-4), n)
        p16, _ = _run(make_optimizer(1e-3, 1e-4, moment_dtype="bfloat16"), n)
        for k in p32:
            a, b = np.asarray(p32[k]), np.asarray(p16[k])
            # bf16 moment rounding perturbs each step's direction by
            # ~2^-9 relative; over 50 lr=1e-3 steps the accumulated
            # parameter deviation stays well inside 1e-3 absolute
            assert np.max(np.abs(a - b)) < 1e-3, k
            assert not np.array_equal(a, b), "bf16 path suspiciously exact"

    def test_resume_roundtrip_is_exact(self):
        import optax

        tx = make_optimizer(1e-3, 1e-4, moment_dtype="bfloat16")
        params = _params()
        state = tx.init(params)
        rng = np.random.RandomState(3)
        grad_seq = [_grad(params, rng) for _ in range(8)]

        def advance(params, state, grads_list):
            for g in grads_list:
                updates, state = tx.update(g, state, params)
                params = optax.apply_updates(params, updates)
            return params, state

        p_straight, s_straight = advance(params, state, grad_seq)

        p_mid, s_mid = advance(params, state, grad_seq[:4])
        # checkpoint round-trip: device -> host numpy -> device
        p_mid = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), p_mid)
        s_mid = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), s_mid)
        p_resumed, s_resumed = advance(p_mid, s_mid, grad_seq[4:])

        for a, b in zip(jax.tree.leaves(p_straight), jax.tree.leaves(p_resumed)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s_straight), jax.tree.leaves(s_resumed)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_float32_request_uses_exact_default(self):
        n = 10
        p_def, s_def = _run(make_optimizer(1e-3, 1e-4), n)
        p_f32, s_f32 = _run(make_optimizer(1e-3, 1e-4, moment_dtype="float32"), n)
        for a, b in zip(jax.tree.leaves(p_def), jax.tree.leaves(p_f32)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_lowp_fp32_storage_matches_optax(self):
        """scale_by_adam_lowp's math (not just its storage) is optax's."""
        import optax

        n = 10
        tx_a = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        tx_b = scale_by_adam_lowp(moment_dtype=jnp.float32)
        pa, _ = _run(optax.chain(tx_a, optax.scale(-1e-3)), n)
        pb, _ = _run(optax.chain(tx_b, optax.scale(-1e-3)), n)
        for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-7
            )
