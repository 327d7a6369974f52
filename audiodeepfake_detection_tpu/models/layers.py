"""Shared flax layers with torch-parity semantics.

The reference models are built from torch ``Conv2d/PReLU/MaxPool2d/
SyncBatchNorm/Dropout/LSTM`` plus the ASVspoof ``MaxFeatureMap2D`` maxout
(reference: src/audiofakedetect/models.py).  These re-implementations keep
torch's exact numerics where they differ from flax defaults:

* ``BatchNorm``: biased variance for normalisation but *unbiased* variance
  for the running-stat update, momentum 0.1 torch-style, optional affine,
  ``num_batches_tracked`` buffer — so ``.pt`` checkpoints round-trip and
  retraining matches.  Under a batch-sharded ``jit`` the ``jnp.mean``
  reductions are global across the device mesh, which *is* SyncBatchNorm
  (reference wraps every norm in ``nn.SyncBatchNorm``, models.py:260-290) —
  no explicit collective needed.
* ``PReLU``: single shared slope, init 0.25 (torch default).
* internal layout is NHWC (TPU-native); importers transpose torch's OIHW.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def _torch_bn_stats(
    mdl: nn.Module, x: jnp.ndarray, train: bool, momentum: float, stats=None
):
    """Torch-semantics BN statistics on module ``mdl``: biased variance for
    normalisation, unbiased for the running update, momentum torch-style,
    ``num_batches_tracked`` buffer.  Returns the (mean, var) to normalise
    with.  Shared by :class:`BatchNorm` and the folded BN+conv path so the
    ``batch_stats`` tree is identical either way.

    ``stats``: optional precomputed per-channel f32 ``(sum, sumsq)`` of
    ``x`` (e.g. accumulated inside a fused producer kernel, see
    ops/fused_conv1.py) — skips re-reading the activation; gradients flow
    through the provided moments.
    """
    features = x.shape[-1]
    ra_mean = mdl.variable(
        "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
    )
    ra_var = mdl.variable(
        "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
    )
    n_tracked = mdl.variable(
        "batch_stats", "num_batches_tracked", lambda: jnp.zeros((), jnp.int32)
    )
    if train:
        axes = tuple(range(x.ndim - 1))
        n = 1.0
        for d in axes:
            n *= x.shape[d]
        if stats is not None:
            s, q = stats
            mean = s.astype(jnp.float32) / n
            mean2 = q.astype(jnp.float32) / n
        else:
            # statistics always accumulate in fp32 (bf16 activations would
            # lose precision over millions of elements)
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=axes)
            mean2 = jnp.mean(jax.lax.square(x32), axis=axes)
        var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)
        if not mdl.is_initializing():
            unbiased = var * (n / max(n - 1.0, 1.0))
            m = momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * mean
            ra_var.value = (1 - m) * ra_var.value + m * unbiased
            n_tracked.value = n_tracked.value + 1
    else:
        mean, var = ra_mean.value, ra_var.value
    return mean, var


class BatchNorm(nn.Module):
    """Torch-semantics batch normalisation over the last (feature) axis."""

    affine: bool = True
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        features = x.shape[-1]
        mean, var = _torch_bn_stats(self, x, train, self.momentum)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (features,))
            bias = self.param("bias", nn.initializers.zeros, (features,))
            y = y * scale + bias
        return y.astype(x.dtype)


class BatchNormStats(nn.Module):
    """BN variables + statistics only — for folding the normalisation into
    a following convolution (see models/dcnn.py).  Returns the per-channel
    affine form of the normalisation: ``BN(x) = x * s + t``."""

    affine: bool = True
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, stats=None):
        features = x.shape[-1]
        mean, var = _torch_bn_stats(self, x, train, self.momentum, stats)
        s = jax.lax.rsqrt(var + self.eps)
        t = -mean * s
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (features,))
            bias = self.param("bias", nn.initializers.zeros, (features,))
            s = s * scale
            t = t * scale + bias
        return s, t


class ConvParams(nn.Module):
    """Bare conv parameters in the standard ``Conv_0/{kernel,bias}`` layout
    (used by fused paths so the param tree matches a plain ``Conv2d``)."""

    kshape: tuple

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kshape
        )
        bias = self.param("bias", nn.initializers.zeros, (self.kshape[-1],))
        return kernel, bias


class ConvScope(nn.Module):
    kshape: tuple

    @nn.compact
    def __call__(self):
        return ConvParams(self.kshape, name="Conv_0")()


def folded_bn_conv(
    x: jnp.ndarray,
    train: bool,
    *,
    bn_name: str,
    conv_name: str,
    affine: bool,
    features: int,
    kernel_size: int,
    padding: int,
    dilation: int = 1,
    precision=None,
    stats=None,
    act_scale: Optional[float] = None,
    mdl=None,
) -> jnp.ndarray:
    """``conv(BN(x))`` with the normalisation folded into the conv weights.

    BN is per-channel affine, ``BN(x) = x*s + t``, so
    ``conv_pad(BN(x)) = conv_pad(x, w*s) + conv_pad(t*1, w)`` — the second
    term is a batch-1 convolution of the constant map (it differs from a
    plain bias only near padded borders).  This skips materialising the
    normalised tensor entirely; statistics/running updates and gradients
    are unchanged (identical math, different schedule).  Param/batch-stats
    trees match the unfused ``BatchNorm`` + ``Conv2d`` exactly.  Must be
    called inside an ``@nn.compact`` ``__call__`` (the child modules attach
    to the calling scope).  ``stats``: optional precomputed ``(sum, sumsq)``
    of ``x`` for the BN moments (see ``_torch_bn_stats``).

    ``act_scale``: calibrated per-tensor activation scale — runs the main
    conv as s8xs8->s32 on the MXU (ops/quantize.py), dequantized with the
    per-output-channel weight scales.  Inference-only (the straight-through
    rounding has no gradient); the correction-map conv and bias stay in the
    working dtype.  ``mdl``: the calling module — enables baked int8
    weights for this site (``bake_int8_weights``), stored in the caller's
    ``int8`` collection under ``<conv_name>_q8``.
    """
    s, t = BatchNormStats(affine=affine, name=bn_name)(x, train, stats)
    cin = x.shape[-1]
    kernel, bias = ConvScope(
        (kernel_size, kernel_size, cin, features), name=conv_name
    )()
    dt = x.dtype
    dn = ("NHWC", "HWIO", "NHWC")
    pad = [(padding, padding), (padding, padding)]
    dil = (dilation, dilation)
    if act_scale is not None:
        from ..ops.quantize import conv_int8_weights, quantized_conv, site_baked

        # fold in fp32 (weight quantization thresholds shouldn't inherit
        # working-dtype rounding), quantize per output channel in the op
        w_folded32 = kernel.astype(jnp.float32) * s.astype(jnp.float32)[
            None, None, :, None
        ]
        # baked record (bake_int8_weights): fold+requantize happen once at
        # bake time, not per dispatch; attaches to the CALLER's scope
        baked = (
            site_baked(mdl, conv_name, lambda: conv_int8_weights(w_folded32))
            if mdl is not None
            else None
        )
        y = quantized_conv(
            x, w_folded32, act_scale, pad, dilation, out_dtype=dt,
            baked=baked,
        )
    else:
        w_folded = (kernel * s[None, None, :, None]).astype(dt)
        y = jax.lax.conv_general_dilated(
            x, w_folded, (1, 1), pad, rhs_dilation=dil,
            dimension_numbers=dn, precision=precision,
        )
    t_map = jnp.broadcast_to(t.astype(dt), (1, x.shape[1], x.shape[2], cin))
    const = jax.lax.conv_general_dilated(
        t_map, kernel.astype(dt), (1, 1), pad, rhs_dilation=dil,
        dimension_numbers=dn, precision=precision,
    )
    return y + const + bias.astype(dt)


class PReLU(nn.Module):
    """Torch ``nn.PReLU()``: one shared learnable slope, init 0.25."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", lambda key: jnp.asarray(self.init, jnp.float32)
        )
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class Conv2d(nn.Module):
    """Torch-style Conv2d on NHWC input (symmetric int padding, dilation)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    precision: Any = jax.lax.Precision.HIGHEST
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = _pair(self.padding)
        return nn.Conv(
            features=self.features,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.stride),
            padding=(p[0], p[1]),
            kernel_dilation=_pair(self.dilation),
            use_bias=self.use_bias,
            precision=self.precision,
            dtype=self.dtype,
        )(x)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Torch MaxPool2d(2, 2) (floor mode) on NHWC.

    ``reduce_window`` on purpose: its backward is TPU ``select-and-scatter``
    (~2.8 ms/step in the fused train step) but every structural alternative
    measured SLOWER end-to-end (docs/benchmarks.md negative results):
    crop+reshape-max forward 22.2 ms, phase-mask interleave VJP 26.1 ms,
    and a block-view first-max-mask custom VJP (exact tie-break parity,
    kept under test in tests/test_first_conv.py) 19.9 vs 14.7 ms — the
    stack/moveaxis interleave materializes relaid-out copies of the 410 MB
    layer-1 tensor that XLA's select-and-scatter never needs.
    """
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def max_feature_map_2d(x: jnp.ndarray) -> jnp.ndarray:
    """MaxFeatureMap2D maxout over channel halves (NHWC layout).

    Torch splits channel dim C (axis 1, NCHW) as (2, C/2) and maxes the
    leading factor (reference: src/audiofakedetect/models.py:161-209); the
    NHWC equivalent pairs channel j with j + C/2.  Written as a maximum of
    two channel slices, NOT a (..., 2, C/2) reshape + reduce: the 5-D
    reshape forces a 32-lane layout and its backward materializes two
    full-size broadcasts (~2 ms/step in the LCNN profile); the slice form
    stays in the native layout and its backward is a fusible masked select.
    """
    c = x.shape[-1]
    assert c % 2 == 0, "MaxFeatureMap2D needs an even channel count"
    return jnp.maximum(x[..., : c // 2], x[..., c // 2 :])


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.Dropout(rate=self.rate, deterministic=not train)(x)


class BLSTMLayer(nn.Module):
    """Bidirectional LSTM keeping sequence length, out dim == hidden*2.

    Parity with the reference's ``BLSTMLayer`` wrapper around torch
    ``nn.LSTM(input, output//2, bidirectional=True)``
    (reference: src/audiofakedetect/models.py:212-237).

    Both directions run in ONE ``lax.scan``: the forward sequence and the
    time-reversed backward sequence are stacked on a direction axis and the
    recurrent matmul is batched over it (``dbh,dgh->dbg``) — halving the
    sequential chain length vs two scans (the scan is latency-bound on TPU,
    the per-step matmuls are tiny).
    """

    input_dim: int
    output_dim: int
    # lax.scan unroll factor: K steps per loop iteration trades compiled
    # code size for less while-loop overhead (the scan is latency-bound —
    # the per-step recurrent matmul is tiny).  Measured on v5e (see
    # docs/benchmarks.md "LCNN scan unrolling").
    unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.output_dim % 2 == 0
        hidden = self.output_dim // 2
        k = 1.0 / jnp.sqrt(hidden)

        def uni(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -k, k)

        proj = []
        w_hh_both = []
        for direction, reverse in (("fw", False), ("bw", True)):
            w_ih = self.param(f"w_ih_{direction}", uni, (4 * hidden, self.input_dim))
            w_hh = self.param(f"w_hh_{direction}", uni, (4 * hidden, hidden))
            b_ih = self.param(f"b_ih_{direction}", uni, (4 * hidden,))
            b_hh = self.param(f"b_hh_{direction}", uni, (4 * hidden,))
            # big input projection outside the scan (MXU work)
            p = (
                jnp.einsum(
                    "btd,hd->bth", x, w_ih,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + b_ih
                + b_hh
            )
            proj.append(jnp.flip(p, axis=1) if reverse else p)
            w_hh_both.append(w_hh)
        xp = jnp.stack(proj)  # [2, B, T, 4H]
        w_hh = jnp.stack(w_hh_both)  # [2, 4H, H]
        b, t = x.shape[0], x.shape[1]

        def step(carry, xt):  # xt: [2, B, 4H]
            h, c = carry
            z = xt + jnp.einsum(
                "dbh,dgh->dbg", h, w_hh, precision=jax.lax.Precision.HIGHEST
            )
            i, f, g, o = jnp.split(z, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (
            jnp.zeros((2, b, hidden), xp.dtype),
            jnp.zeros((2, b, hidden), xp.dtype),
        )
        _, hs = jax.lax.scan(
            step, init, jnp.moveaxis(xp, 2, 0), unroll=self.unroll
        )  # [T, 2, B, H]
        fw = jnp.moveaxis(hs[:, 0], 0, 1)  # [B, T, H]
        bw = jnp.flip(jnp.moveaxis(hs[:, 1], 0, 1), axis=1)
        return jnp.concatenate([fw, bw], axis=-1)
