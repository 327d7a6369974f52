"""Shallow linear-regression baseline (reference models.py:134-158)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Regression(nn.Module):
    """``Linear(num_of_scales * 101, 2)`` + LogSoftmax over a flattened image."""

    nclasses: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.nclasses, name="linear")(x)
        return nn.log_softmax(x, axis=-1)

    def get_name(self) -> str:
        return "Regression"
