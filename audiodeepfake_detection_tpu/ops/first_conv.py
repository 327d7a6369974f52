"""First-layer conv with a bandwidth-lean custom VJP.

XLA's transpose of the DCNN's first convolution (3x3, padding=2, 1-2 input
channels, 64 output channels on a [128, 97, 258] activation) materializes a
full spatial ``reverse`` of the 410 MB output gradient and then runs a
giant-window convolution against it (measured ~2.4 ms of the 16.3 ms train
step, tools/profile_step.py + tools/dump_hlo.py).  The kernel gradient is
just a correlation of a *small* input (6 MB) with that gradient, so this
custom VJP computes it as one tall-skinny matmul over shifted input patches
— the gradient tensor is read exactly once, nothing is reversed:

    dk[kh, kw, i, c] = sum_{b,h,w} x_pad[b, h+kh, w+kw, i] * dy[b, h, w, c]
                     = einsum('bhwpi,bhwc->pic', patches, dy)

The input cotangent is still produced (standard flipped-kernel conv) for
correctness, but in the DCNN the layer input comes from a stop-gradient
transform, so XLA dead-code-eliminates it.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def first_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    padding: int = 2,
    precision: Any = None,
) -> jnp.ndarray:
    """``Conv2d(cin, cout, k, padding)`` on NHWC with the lean backward."""
    return _conv_fwd_value(x, kernel, bias, padding, precision)


def _conv_fwd_value(x, kernel, bias, padding, precision):
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return y + bias


def _first_conv_fwd(x, kernel, bias, padding, precision):
    return _conv_fwd_value(x, kernel, bias, padding, precision), (x, kernel)


def _first_conv_bwd(padding, precision, residuals, dy):
    x, kernel = residuals
    kh, kw, cin, cout = kernel.shape
    b, h, w, _ = x.shape
    ho, wo = h + 2 * padding - (kh - 1), w + 2 * padding - (kw - 1)

    # kernel grad: one pass over dy, patches are shifted views of the
    # (small) padded input
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    patches = jnp.stack(
        [
            xp[:, i : i + ho, j : j + wo, :]
            for i in range(kh)
            for j in range(kw)
        ],
        axis=3,
    )  # [B, Ho, Wo, kh*kw, cin]
    dk = jnp.einsum(
        "bhwpi,bhwc->pic",
        patches.astype(dy.dtype),
        dy,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    dk = dk.reshape(kh, kw, cin, cout).astype(kernel.dtype)

    db = jnp.sum(dy, axis=(0, 1, 2), dtype=jnp.float32).astype(dy.dtype)

    # input cotangent: conv of dy with the spatially flipped kernel;
    # output pad p' satisfies h = ho + 2p' - (kh-1)
    pi = (kh - 1) - padding
    dxk = jnp.flip(kernel, (0, 1)).swapaxes(2, 3).astype(dy.dtype)
    dx = lax.conv_general_dilated(
        dy,
        dxk,
        window_strides=(1, 1),
        padding=[(pi, pi), (pi, pi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    ).astype(x.dtype)
    return dx, dk, db


first_conv.defvjp(_first_conv_fwd, _first_conv_bwd)
