"""Tests for the Pallas-aware compiled-cost accounting (utils/costs.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodeepfake_detection_tpu.utils.costs import (
    compiled_cost,
    custom_call_traffic,
    shape_bytes,
)

_FAKE_HLO = """\
HloModule jit_step, is_scheduled=true

ENTRY %main (p0: f32[128,22050], p1: bf16[11,256]) -> (bf16[128,256,95], f32[2]) {
  %p0 = f32[128,22050]{1,0:T(8,128)} parameter(0)
  %p1 = bf16[11,256]{1,0:T(8,128)(2,1)} parameter(1)
  %scale = f32[] constant(2)
  %wpt = bf16[128,256,95]{2,1,0:T(8,128)(2,1)} custom-call(%p0, %p1, %scale), custom_call_target="tpu_custom_call", metadata={op_name="wpt"}
  %other = f32[2]{0} custom-call(%scale), custom_call_target="SomeHostCallback"
  ROOT %t = (bf16[128,256,95]{2,1,0}, f32[2]{0}) tuple(%wpt, %other)
}
"""


class TestShapeBytes:
    def test_plain_array(self):
        assert shape_bytes("f32[128,22050]{1,0}") == 128 * 22050 * 4

    def test_bf16_with_tiled_layout(self):
        # tile annotation digits must not be parsed as extra arrays
        assert shape_bytes("bf16[8,128]{1,0:T(8,128)(2,1)}") == 8 * 128 * 2

    def test_scalar_and_tuple(self):
        assert shape_bytes("f32[]") == 4
        assert (
            shape_bytes("(bf16[4,8]{1,0}, s32[3]{0}, pred[]) ")
            == 4 * 8 * 2 + 3 * 4 + 1
        )


class TestCustomCallTraffic:
    def test_counts_only_mosaic_targets(self):
        got = custom_call_traffic(_FAKE_HLO)
        # operands: p0 (128*22050*4) + p1 (11*256*2) + scalar (4)
        # result:   bf16[128,256,95] (*2)
        want = 128 * 22050 * 4 + 11 * 256 * 2 + 4 + 128 * 256 * 95 * 2
        assert got["calls"] == 1
        assert got["bytes"] == float(want)

    def test_no_custom_calls(self):
        got = custom_call_traffic("ENTRY %m () -> f32[] { ROOT %c = f32[] constant(0) }")
        assert got == {"bytes": 0.0, "calls": 0}


class TestCompiledCost:
    def test_cpu_compiled_function(self):
        # plain XLA program: xla_bytes > 0, no Mosaic calls
        f = jax.jit(lambda x, y: jnp.dot(x, y) + 1.0)
        compiled = f.lower(
            np.ones((64, 64), np.float32), np.ones((64, 64), np.float32)
        ).compile()
        cost = compiled_cost(compiled)
        assert cost["pallas_calls"] == 0
        assert cost["pallas_bytes"] == 0.0
        assert cost["bytes"] == cost["xla_bytes"] > 0
        assert cost["xla_flops"] > 0
