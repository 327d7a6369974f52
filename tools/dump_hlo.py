"""Dump the compiled HLO of the fused train step and summarize big ops.

Maps profiler op names (fusion.N, select-and-scatter.N, reverse...) to
tensor shapes so HBM-traffic attribution is possible.  Uses the persistent
compilation cache so repeat runs skip the remote compile.
"""

from __future__ import annotations

import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

def main(fused: bool = False) -> None:
    from bench_matrix import headline_setup

    _model, _transform, batch, state, step = headline_setup(fused=fused)
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    text = compiled.as_text()
    out = "/tmp/train_step_hlo.txt"
    with open(out, "w") as fh:
        fh.write(text)
    print(f"wrote {out} ({len(text)} bytes)")

    # summarize: find named computations of interest with their root shapes.
    # The shape group must admit tuple-shaped multi-output ops like
    # "(f32[128]{0}, bf16[128,256,95]{2,1,0})" — the biggest HBM consumers
    # (BN-stat fusions, fused kernels) are multi-output.
    pat = re.compile(
        r"^\s*(?:ROOT )?%?([\w.-]+(?:\.\d+)?) = (\([^)]*\)|\S+) (\w[\w-]*)\(",
        re.M,
    )
    wanted = re.compile(r"select-and-scatter|reverse|^fusion")
    _BYTES = {
        "pred": 1, "s8": 1, "u8": 1,
        "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
        "f64": 8, "s64": 8, "u64": 8, "c64": 8,
        "c128": 16,
    }
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
            total += n * _BYTES.get(dt, 4)
        sizes.append((total, name, shape[:90]))
    sizes.sort(reverse=True)
    for total, name, shape in sizes[:30]:
        print(f"{total / 1e6:10.1f} MB  {name:28s} {shape}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", action="store_true")
    main(fused=ap.parse_args().fused)
