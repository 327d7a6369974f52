"""True multi-process integration test for the multi-host feeding path.

Spawns two real processes that form a jax.distributed cluster on the CPU
backend, each feeding its process-local loader slice through
``shard_batch`` (``jax.make_array_from_process_local_data``) into a jitted
global-batch reduction.  This is the end-to-end counterpart of the
single-controller unit tests in tests/test_dataset.py — the actual
torchrun/DDP replacement (reference train_classifier.py:44-47,119-127).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    import jax

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    import numpy as np

    sys.path.insert(0, %(repo)r)
    from audiodeepfake_detection_tpu.parallel.mesh import get_mesh, shard_batch

    assert jax.process_count() == 2, jax.process_count()
    mesh = get_mesh()  # all devices across both processes

    # every process builds ITS OWN strided slice of an 11-sample dataset --
    # uneven globally (one -1 pad sentinel), 6 rows per process, divisible
    # by the 2 local devices each process contributes
    n = 11
    order = np.arange(n)
    total = -(-n // 2) * 2
    padded = np.full(total, -1, dtype=np.int64)
    padded[:n] = order
    local = padded[pid::2]
    weight = (local >= 0).astype(np.float32)
    value = np.where(local >= 0, local, 0).astype(np.float32)
    batch = {"value": value, "weight": weight}

    global_batch = shard_batch(mesh, batch)
    assert global_batch["value"].shape[0] == total

    @jax.jit
    def reduce(b):
        return (b["value"] * b["weight"]).sum(), b["weight"].sum()

    s, c = reduce(global_batch)
    # every process sees the same global result
    assert float(c) == n, float(c)
    assert float(s) == sum(range(n)), float(s)
    print(f"proc {pid}: OK sum={float(s)} count={float(c)}")
    """
)


_TRAIN_WORKER = textwrap.dedent(
    """
    import sys
    import jax

    coord, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, %(repo)r)
    from audiodeepfake_detection_tpu.models import DCNN
    from audiodeepfake_detection_tpu.ops.wpt import packet_image
    from audiodeepfake_detection_tpu.parallel.mesh import (
        get_mesh, replicate, shard_batch,
    )
    from audiodeepfake_detection_tpu.train.steps import (
        create_train_state, make_eval_step, make_optimizer, make_train_step,
    )

    assert jax.process_count() == 2
    mesh = get_mesh()  # 8 global devices, 4 per process

    model = DCNN(
        time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
        ochannels4=8, ochannels5=2, with_dropout=False,
    )

    def transform(audio):
        return packet_image(audio, "haar", level=8, log_scale=True)

    # the SAME deterministic global batch the single-process comparison
    # run builds; each process feeds its strided slice (loader contract)
    rng = np.random.RandomState(0)
    B = 16
    batch = {
        "audio": rng.randn(B, 1, 2048).astype(np.float32),
        "label": rng.randint(0, 2, B).astype(np.int32),
        "weight": np.ones(B, np.float32),
    }
    local = {k: v[pid::2] for k, v in batch.items()}

    tx = make_optimizer(4e-4, 1e-3)
    image = transform(jnp.asarray(batch["audio"][:2]))
    state = create_train_state(model, tx, image, seed=0)
    state = state._replace(
        params=replicate(mesh, state.params),
        batch_stats=replicate(mesh, state.batch_stats),
        opt_state=replicate(mesh, state.opt_state),
    )

    device_batch = shard_batch(mesh, local)
    assert device_batch["audio"].shape[0] == B  # global batch assembled

    # ONE full DP train step: cross-process grad psum + global BN moments
    train_step = make_train_step(model, transform, tx)
    state, stats = train_step(state, device_batch)
    loss = float(stats["loss"])

    # ... and a full eval pass over the same global batch
    eval_step = make_eval_step(model, transform)
    res = eval_step(state.params, state.batch_stats, device_batch)

    if pid == 0:
        flat, _ = jax.tree_util.tree_flatten(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        np.savez(
            out_path,
            *[np.asarray(leaf) for leaf in flat],
            loss=loss,
            ok=np.asarray(res["ok_per_label"]),
            cnt=np.asarray(res["count_per_label"]),
        )
    print(f"proc {pid}: OK loss={loss:.6f}")
    """
)


@pytest.mark.skipif(
    os.environ.get("SKIP_MULTIPROCESS") == "1", reason="multiprocess disabled"
)
def test_two_process_full_train_step(tmp_path, eight_devices):
    """One complete DP train step + eval across 2 real processes must equal
    the single-process 8-device run leaf-for-leaf — the actual SyncBN/DDP
    replacement (reference train_classifier.py:44-47,322,453-459)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    out_path = str(tmp_path / "proc0_result.npz")
    script = _TRAIN_WORKER % {
        "repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    }
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, coord, str(pid), out_path],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: OK" in out

    got = np.load(out_path)

    # --- single-process 8-device reference run (this test session's mesh)
    from audiodeepfake_detection_tpu.models import DCNN
    from audiodeepfake_detection_tpu.ops.wpt import packet_image
    from audiodeepfake_detection_tpu.parallel.mesh import (
        get_mesh,
        replicate,
        shard_batch,
    )
    from audiodeepfake_detection_tpu.train.steps import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    mesh = get_mesh()
    model = DCNN(
        time_dim=1, ochannels1=4, ochannels2=4, ochannels3=6,
        ochannels4=8, ochannels5=2, with_dropout=False,
    )

    def transform(audio):
        return packet_image(audio, "haar", level=8, log_scale=True)

    rng = np.random.RandomState(0)
    B = 16
    batch = {
        "audio": rng.randn(B, 1, 2048).astype(np.float32),
        "label": rng.randint(0, 2, B).astype(np.int32),
        "weight": np.ones(B, np.float32),
    }
    tx = make_optimizer(4e-4, 1e-3)
    image = transform(jnp.asarray(batch["audio"][:2]))
    state = create_train_state(model, tx, image, seed=0)
    state = state._replace(
        params=replicate(mesh, state.params),
        batch_stats=replicate(mesh, state.batch_stats),
        opt_state=replicate(mesh, state.opt_state),
    )
    device_batch = shard_batch(mesh, batch)
    state, stats = make_train_step(model, transform, tx)(state, device_batch)
    res = make_eval_step(model, transform)(
        state.params, state.batch_stats, device_batch
    )

    np.testing.assert_allclose(
        float(stats["loss"]), float(got["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(res["ok_per_label"]), got["ok"])
    np.testing.assert_allclose(np.asarray(res["count_per_label"]), got["cnt"])
    flat, _ = jax.tree_util.tree_flatten(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    for i, leaf in enumerate(flat):
        np.testing.assert_allclose(
            np.asarray(leaf),
            got[f"arr_{i}"],
            rtol=1e-6,
            atol=1e-7,
            err_msg=f"leaf {i} diverged between 2-process and 1-process runs",
        )


@pytest.mark.skipif(
    os.environ.get("SKIP_MULTIPROCESS") == "1", reason="multiprocess disabled"
)
def test_two_process_cluster_feeding(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = _WORKER % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # TWO virtual devices per process (4 global): the worker's batch math
    # below depends on each process contributing 2 local devices
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, coord, str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: OK" in out
