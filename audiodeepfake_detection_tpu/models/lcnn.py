"""LCNN: max-feature-map CNN + BLSTM classifier (ASVspoof 2021 LA baseline).

Parity target: reference src/audiofakedetect/models.py:68-131 (LCNN),
:161-209 (MaxFeatureMap2D), :212-237 (BLSTMLayer).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    BatchNorm,
    BLSTMLayer,
    Conv2d,
    Dropout,
    max_feature_map_2d,
    max_pool_2x2,
)


class LCNN(nn.Module):
    """LCNN with 2D convolutions for audio deepfake detection."""

    classes: int = 2
    in_channels: int = 1
    lstm_channels: int = 256
    dtype: Any = None
    precision: Any = None
    # fold each BatchNorm into its following conv (identical math; see
    # layers.folded_bn_conv)
    fold_bn: bool = True
    # Fuse conv(5x5)+MaxFeatureMap+pool into one Pallas kernel
    # (ops/fused_conv1.py, MFM variant).  True = training only (the win is
    # in the fwd+bwd pair); "always" forces it in eval too (parity tests).
    # Requires a single input channel.
    fused_layer1: Any = False
    # Device mesh for SPMD (see models/dcnn.py::DCNN.mesh).
    mesh: Any = None
    # BLSTM lax.scan unroll factor (see layers.BLSTMLayer.unroll).
    lstm_unroll: int = 1
    # The reference hardcodes Dropout(0.7) (models.py:113); a knob with the
    # same default lets deterministic parity tests zero it on both sides.
    dropout: float = 0.7
    # Post-training int8 quantization (inference only, ops/quantize.py):
    # "calibrate" records each conv input's absmax into the "quant_obs"
    # collection; a {conv_name: act_scale} dict runs those convs as
    # s8xs8->s32 MXU ops.  The BLSTM and fc head stay in the working
    # dtype.  Requires fold_bn and train=False (same contract as DCNN).
    quant: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import jax

        prec = (
            jax.lax.Precision.HIGHEST if self.precision is None else self.precision
        )

        def Conv2d(*a, **k):
            from .layers import Conv2d as _C

            return _C(*a, precision=prec, dtype=self.dtype, **k)

        if self.quant is not None:
            if train:
                raise ValueError(
                    "quant is inference-only (int8 rounding has no gradient);"
                    " call with train=False"
                )
            if not self.fold_bn:
                raise ValueError(
                    "quant requires fold_bn=True: BatchNorm folds into the"
                    " quantized conv weights"
                )

        def _quant_site(mdl_x, conv_name):
            from ..ops.quantize import site_scale

            return site_scale(self, self.quant, conv_name, mdl_x)

        # [B, C, F, T] -> permute F/T (reference models.py:125) -> NHWC
        x = jnp.transpose(x, (0, 3, 2, 1))  # [B, T, F, C]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def bn_conv(x, bn_name, conv_name, feat, k, padding):
            if self.fold_bn:
                from .layers import folded_bn_conv

                return folded_bn_conv(
                    x, train,
                    bn_name=bn_name, conv_name=conv_name, affine=False,
                    features=feat, kernel_size=k, padding=padding,
                    precision=prec,
                    act_scale=_quant_site(x, conv_name), mdl=self,
                )
            x = BatchNorm(affine=False, name=bn_name)(x, train)
            return Conv2d(feat, k, padding=padding, name=conv_name)(x)

        def plain_conv(x, feat, k, padding, name):
            """The two un-normalized 1x1 convs, int8-capable."""
            scale = _quant_site(x, name)
            if scale is not None:
                from ..ops.quantize import (
                    conv_int8_weights,
                    quantized_conv,
                    site_baked,
                )

                kernel, bias = ConvScope(
                    (k, k, x.shape[-1], feat), name=name
                )()
                k32 = kernel.astype(jnp.float32)
                baked = site_baked(
                    self, name, lambda k32=k32: conv_int8_weights(k32)
                )
                return quantized_conv(
                    x, k32, scale, padding, out_dtype=x.dtype, baked=baked,
                ) + bias.astype(x.dtype)
            return Conv2d(feat, k, padding=padding, name=name)(x)

        from .layers import ConvScope

        kernel, bias = ConvScope((5, 5, x.shape[-1], 64), name="lcnn_0")()
        if self.fused_layer1:
            from ..ops.fused_conv1 import fused_geometry_fits
        use_fused = (
            bool(self.fused_layer1)
            and x.shape[-1] == 1
            and (train or self.fused_layer1 == "always")
            # degenerate geometries (huge images, e.g. hop_length=1
            # spectrograms) exceed the kernel's VMEM scratch
            and fused_geometry_fits(x.shape[1], x.shape[2], 5)
        )
        if use_fused:
            # one Pallas pass: the 420+ MB pre-pool activation never leaves
            # VMEM (ops/fused_conv1.py, MFM variant)
            from ..ops.fused_conv1 import (
                batch_shard_mapped,
                can_batch_shard,
                fused_conv_mfm_pool,
            )

            fn = fused_conv_mfm_pool
            if can_batch_shard(self.mesh, x.shape[0]):
                fn = batch_shard_mapped(fn, self.mesh)
            x = fn(
                x[..., 0],
                kernel.reshape(25, 64).astype(x.dtype),
                bias.astype(x.dtype),
            )
        else:
            # first conv via the bandwidth-lean custom VJP (same pathology
            # as the DCNN's conv1: XLA's default transpose reverses the
            # full output-gradient tensor; see ops/first_conv.py)
            from ..ops.first_conv import first_conv

            scale0 = _quant_site(x, "lcnn_0")
            if scale0 is not None:
                from ..ops.quantize import (
                    conv_int8_weights,
                    quantized_conv,
                    site_baked,
                )

                k32 = kernel.astype(jnp.float32)
                baked = site_baked(
                    self, "lcnn_0", lambda: conv_int8_weights(k32)
                )
                x = quantized_conv(
                    x, k32, scale0, 2, out_dtype=x.dtype, baked=baked,
                ) + bias.astype(x.dtype)
            else:
                x = first_conv(
                    x, kernel.astype(x.dtype), bias.astype(x.dtype), 2, prec
                )
            x = max_feature_map_2d(x)
            x = max_pool_2x2(x)
        x = plain_conv(x, 64, 1, 0, "lcnn_3")
        x = max_feature_map_2d(x)
        x = bn_conv(x, "lcnn_5", "lcnn_6", 96, 3, 1)
        x = max_feature_map_2d(x)
        x = max_pool_2x2(x)
        x = bn_conv(x, "lcnn_9", "lcnn_10", 96, 1, 0)
        x = max_feature_map_2d(x)
        x = bn_conv(x, "lcnn_12", "lcnn_13", 128, 3, 1)
        x = max_feature_map_2d(x)
        x = max_pool_2x2(x)
        x = plain_conv(x, 128, 1, 0, "lcnn_16")
        x = max_feature_map_2d(x)
        x = bn_conv(x, "lcnn_18", "lcnn_19", 64, 3, 1)
        x = max_feature_map_2d(x)
        x = bn_conv(x, "lcnn_21", "lcnn_22", 64, 1, 0)
        x = max_feature_map_2d(x)
        x = bn_conv(x, "lcnn_24", "lcnn_25", 64, 3, 1)
        x = max_feature_map_2d(x)
        x = max_pool_2x2(x)
        x = Dropout(self.dropout, name="lcnn_drop")(x, train)

        # NHWC [B, T', F', 32]; reference flattens (channels, F') per time
        # step in NCHW (C, W) order: permute(0,2,1,3).view(B, T', C*W)
        # (models.py:126-128).
        b, t = x.shape[0], x.shape[1]
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, -1)

        feat = (self.lstm_channels // 16) * 32
        x = BLSTMLayer(feat, feat, unroll=self.lstm_unroll, name="lstm_0")(x)
        x = BLSTMLayer(feat, feat, unroll=self.lstm_unroll, name="lstm_1")(x)
        x = nn.Dense(self.classes, name="fc", dtype=self.dtype)(x)
        return jnp.mean(x, axis=1).astype(jnp.float32)

    def get_name(self) -> str:
        return "LCNN"
