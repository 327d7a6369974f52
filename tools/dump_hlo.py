"""Dump the compiled HLO of the fused train step and summarize big ops.

Maps profiler op names (fusion.N, select-and-scatter.N, reverse...) to
tensor shapes so HBM-traffic attribution is possible.  Uses the persistent
compilation cache so repeat runs skip the remote compile.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from audiodeepfake_detection_tpu.models import DCNN
    from audiodeepfake_detection_tpu.ops.wpt import packet_image
    from audiodeepfake_detection_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = DCNN(
        time_dim=12, precision=jax.lax.Precision.DEFAULT, dtype=jnp.bfloat16
    )

    def transform(audio):
        return packet_image(audio, "sym5", level=8, log_scale=True, power=2.0)

    tx = make_optimizer(4e-4, 1e-3)
    rng = np.random.RandomState(0)
    batch = {
        "audio": rng.randn(128, 1, 22050).astype(np.float32),
        "label": rng.randint(0, 2, 128).astype(np.int32),
    }
    img = transform(jnp.asarray(batch["audio"][:16]))
    state = create_train_state(model, tx, img, seed=0)
    step = make_train_step(model, transform, tx)
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    text = compiled.as_text()
    out = "/tmp/train_step_hlo.txt"
    with open(out, "w") as fh:
        fh.write(text)
    print(f"wrote {out} ({len(text)} bytes)")

    # summarize: find named computations of interest with their root shapes
    pat = re.compile(r"^\s*(?:ROOT )?%?([\w.-]+(?:\.\d+)?) = (\S+) (\w[\w-]*)\(", re.M)
    wanted = re.compile(r"select-and-scatter|reverse|^fusion")
    sizes = []
    for m in pat.finditer(text):
        name, shape, op = m.group(1), m.group(2), m.group(3)
        if not wanted.search(name):
            continue
        nums = re.findall(r"(\w+)\[([\d,]*)\]", shape)
        total = 0
        for dt, dims in nums:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            bytes_per = 2 if "bf16" in dt or "f16" in dt else 4
            total += n * bytes_per
        sizes.append((total, name, shape[:90]))
    sizes.sort(reverse=True)
    for total, name, shape in sizes[:30]:
        print(f"{total / 1e6:10.1f} MB  {name:28s} {shape}")


if __name__ == "__main__":
    main()
