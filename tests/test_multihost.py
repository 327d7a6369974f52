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
