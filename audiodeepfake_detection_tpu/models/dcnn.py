"""DCNN model family: the reference's headline dilated-CNN classifier.

Parity targets (reference: src/audiofakedetect/models.py:240-459):

* ``DCNN``          — 6-conv front + 3 dilated convs + linear head
* ``DCNNxDropout``  — same without the dropout layers
* ``DCNNxDilation`` — same without the dilated block

Geometry notes (verified against the bundled checkpoints): the model input
is the transform image ``[B, C, packets(F), time(T)]``; the reference
immediately permutes to put time on H.  The first conv uses padding=2 with a
3x3 kernel, so T grows by 2 before three 2x2 maxpools — hence the dilated
block's channel count is ``T//8 + time_dim_add`` (12 for stft/sym5, 13 for
coif4).  The under-padded dilated convs shrink (64, 32) -> (40, 8), giving
the flattened size 40*8 = 320 consumed by the 2-way linear head.

Internals run NHWC (TPU layout); the public ``__call__`` takes the NCHW
transform output for reference-API parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    BatchNorm,
    Conv2d,
    ConvScope as _ConvScope,
    Dropout,
    PReLU,
    max_pool_2x2,
)


class _AlphaScope(nn.Module):
    @nn.compact
    def __call__(self):
        return self.param("alpha", lambda key: jnp.asarray(0.25, "float32"))


class DCNN(nn.Module):
    """Deep CNN with dilated convolutions (reference models.py:240-317)."""

    in_channels: int = 1
    ochannels1: int = 64
    ochannels2: int = 64
    ochannels3: int = 96
    ochannels4: int = 128
    ochannels5: int = 32
    kernel1: int = 3
    time_dim: int = 12  # input_dim[-1] // 8 + time_dim_add
    flattend_size: int = 320
    dropout_cnn: float = 0.6
    dropout_lstm: float = 0.2
    nclasses: int = 2
    with_dropout: bool = True
    with_dilation: bool = True
    dtype: Any = None
    precision: Any = None  # None -> fp32-exact (HIGHEST); "default" -> bf16 MXU passes
    # Fold each BatchNorm into its following conv (identical math, skips
    # materialising the normalised tensors; see _folded_bn_conv).
    fold_bn: bool = True
    # Fuse conv1+PReLU+pool into one Pallas kernel (ops/fused_conv1.py).
    # Valid only when the layer input needs no gradient (it never does: the
    # transform in front is stop-gradient) and in_channels == 1, kernel1 == 3.
    # True engages the kernel for TRAINING only (it beats XLA's schedule on
    # the fwd+bwd pair; XLA's plain forward is faster for eval, measured
    # 3.55 vs 3.90 ms/step at batch 128); "always" forces it in eval too
    # (parity tests).
    fused_layer1: Any = False
    # Fuse PReLU+maxpool at the second/third pools into one Pallas pass
    # with a mask-saved VJP (ops/fused_pool.py): the backward reconstructs
    # the full-size cotangent from a 3-bit code instead of running
    # select-and-scatter + PReLU compare-select. Same True/"always" gating.
    fused_pool: Any = False
    # Fuse the whole second pool block — BN(cnn_6)-folded conv(cnn_7) +
    # PReLU(cnn_8) + pool2 — into one Pallas kernel with a full VJP
    # (ops/fused_conv2.py): the [B, H, W, 96] pre-pool activation never
    # exists in HBM in either direction.  Requires fold_bn (the kernel
    # consumes folded weights + a correction map).  Same True/"always"
    # gating as fused_layer1.
    fused_layer2: Any = False
    # Device mesh for SPMD: when set and >1 devices, the fused kernels run
    # per batch shard via shard_map (ops/fused_conv1.batch_shard_mapped) —
    # GSPMD would otherwise replicate the Pallas custom call.
    mesh: Any = None
    # Post-training int8 quantization (inference only, ops/quantize.py):
    # "calibrate" records per-conv input absmax into the "quant_obs"
    # collection; a {conv_name: act_scale} dict runs those convs as
    # s8xs8->s32 MXU ops with per-output-channel weight scales.  Requires
    # fold_bn (BN folds into the quantized weights) and train=False.
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
            """Calibration sow / calibrated scale for one conv input."""
            from ..ops.quantize import site_scale

            return site_scale(self, self.quant, conv_name, mdl_x)

        # [B, C, F, T] -> NHWC [B, T, F, C] (reference permutes F/T then runs
        # NCHW; same arrangement, channel-last).
        x = jnp.transpose(x, (0, 3, 2, 1))
        if self.dtype is not None:
            x = x.astype(self.dtype)

        bn3_stats = None
        if self.fused_layer1:
            from ..ops.fused_conv1 import fused_geometry_fits
        use_fused = (
            bool(self.fused_layer1)
            and x.shape[-1] == 1
            and self.kernel1 == 3
            and (train or self.fused_layer1 == "always")
            # degenerate geometries (huge images) exceed the kernel's VMEM
            # scratch: fall back to the unfused XLA path
            and fused_geometry_fits(x.shape[1], x.shape[2], 3)
        )
        if use_fused:
            from ..ops.fused_conv1 import (
                batch_shard_mapped,
                can_batch_shard,
                fused_conv1_prelu_pool,
                fused_conv1_prelu_pool_stats,
            )

            kernel, bias = _ConvScope(
                (3, 3, 1, self.ochannels1), name="cnn_0"
            )()
            alpha = _AlphaScope(name="cnn_1")()
            fused_args = (
                x[..., 0],
                kernel.reshape(9, self.ochannels1).astype(x.dtype),
                bias.astype(x.dtype),
                alpha.reshape(1).astype(x.dtype),
            )
            fused_fn, fused_stats_fn = (
                fused_conv1_prelu_pool,
                fused_conv1_prelu_pool_stats,
            )
            if can_batch_shard(self.mesh, x.shape[0]):
                fused_fn = batch_shard_mapped(fused_fn, self.mesh)
                fused_stats_fn = batch_shard_mapped(
                    fused_stats_fn, self.mesh, stat_outputs=2
                )
            if train and self.fold_bn:
                # also accumulate the next BN's moments in-kernel: the
                # 100+ MB activation is never re-read by a stats pass
                x, bn_sum, bn_sumsq = fused_stats_fn(*fused_args)
                bn3_stats = (bn_sum, bn_sumsq)
            else:
                x = fused_fn(*fused_args)
        else:
            # first conv via the bandwidth-lean custom VJP: XLA's default
            # transpose reverses the full 410 MB gradient tensor
            # (ops/first_conv.py); the params keep the Conv2d tree layout
            from ..ops.first_conv import first_conv

            k1 = self.kernel1
            kernel, bias = _ConvScope(
                (k1, k1, x.shape[-1], self.ochannels1), name="cnn_0"
            )()
            scale0 = _quant_site(x, "cnn_0")
            if scale0 is not None:
                from ..ops.quantize import (
                    conv_int8_weights,
                    quantized_conv,
                    site_baked,
                )

                k32 = kernel.astype(jnp.float32)
                baked = site_baked(
                    self, "cnn_0", lambda: conv_int8_weights(k32)
                )
                x = quantized_conv(
                    x, k32, scale0, 2, out_dtype=x.dtype, baked=baked,
                ) + bias.astype(x.dtype)
            else:
                x = first_conv(
                    x, kernel.astype(x.dtype), bias.astype(x.dtype), 2, prec
                )
            x = PReLU(name="cnn_1")(x)
            x = max_pool_2x2(x)
        def bn_conv(
            x, bn_name, conv_name, affine, feat, k, padding, dilation=1,
            stats=None,
        ):
            if self.fold_bn:
                from .layers import folded_bn_conv

                return folded_bn_conv(
                    x, train,
                    bn_name=bn_name, conv_name=conv_name, affine=affine,
                    features=feat, kernel_size=k, padding=padding,
                    dilation=dilation, precision=prec, stats=stats,
                    act_scale=_quant_site(x, conv_name), mdl=self,
                )
            x = BatchNorm(affine=affine, name=bn_name)(x, train)
            return Conv2d(
                feat, k, padding=padding, dilation=dilation, name=conv_name
            )(x)

        x = bn_conv(
            x, "cnn_3", "cnn_4", False, self.ochannels2, 1, 0,
            stats=bn3_stats,
        )
        x = PReLU(name="cnn_5")(x)

        use_fused_pool = bool(self.fused_pool) and (
            train or self.fused_pool == "always"
        )

        def prelu_pool(x, alpha_name, want_stats):
            """PReLU + maxpool 2x2, fused (mask-saved VJP) when enabled."""
            from ..ops.fused_pool import fused_pool_geometry_fits

            # same fallback contract as fused_layer1: degenerate activation
            # geometries (VMEM-oversized blocks) take the XLA path instead
            # of failing at Mosaic compile
            if not use_fused_pool or not fused_pool_geometry_fits(
                x.shape[1], x.shape[2], x.shape[3]
            ):
                x = PReLU(name=alpha_name)(x)
                return max_pool_2x2(x), None
            from ..ops.fused_conv1 import batch_shard_mapped, can_batch_shard
            from ..ops.fused_pool import (
                fused_prelu_pool,
                fused_prelu_pool_stats,
            )

            pool_fn, pool_stats_fn = fused_prelu_pool, fused_prelu_pool_stats
            if can_batch_shard(self.mesh, x.shape[0]):
                pool_fn = batch_shard_mapped(pool_fn, self.mesh)
                pool_stats_fn = batch_shard_mapped(
                    pool_stats_fn, self.mesh, stat_outputs=2
                )
            alpha = _AlphaScope(name=alpha_name)().reshape(1)
            if want_stats:
                x, s, q = pool_stats_fn(x, alpha)
                return x, (s, q)
            return pool_fn(x, alpha), None

        if self.fused_layer2:
            from ..ops.fused_conv2 import fused_conv2_geometry_fits
        use_fused2 = (
            bool(self.fused_layer2)
            and self.fold_bn
            and (train or self.fused_layer2 == "always")
            and fused_conv2_geometry_fits(
                x.shape[1], x.shape[2], x.shape[3], self.ochannels3
            )
        )
        if use_fused2:
            # BN(cnn_6) folds into the conv as effective weights + an
            # additive correction map (exact at padded borders, the
            # folded_bn_conv identity); the kernel consumes both and its
            # VJP returns dw_eff/dcorr, which autodiff chains back into
            # the BN moments, conv kernel and bias out here.
            from ..ops.fused_conv1 import batch_shard_mapped, can_batch_shard
            from ..ops.fused_conv2 import (
                fused_conv2_prelu_pool,
                fused_conv2_prelu_pool_stats,
            )
            from .layers import BatchNormStats

            cin = x.shape[-1]
            s, t = BatchNormStats(affine=False, name="cnn_6")(x, train)
            kernel, bias = _ConvScope(
                (3, 3, cin, self.ochannels3), name="cnn_7"
            )()
            dt = x.dtype
            w_eff = (
                (kernel * s[None, None, :, None])
                .reshape(9 * cin, self.ochannels3)
                .astype(dt)
            )
            t_map = jnp.broadcast_to(
                t.astype(dt), (1, x.shape[1], x.shape[2], cin)
            )
            const = jax.lax.conv_general_dilated(
                t_map, kernel.astype(dt), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
            )
            corr = (const[0] + bias.astype(dt)).astype(jnp.float32)
            alpha = _AlphaScope(name="cnn_8")().reshape(1).astype(dt)
            f2_fn, f2_stats_fn = (
                fused_conv2_prelu_pool,
                fused_conv2_prelu_pool_stats,
            )
            if can_batch_shard(self.mesh, x.shape[0]):
                f2_fn = batch_shard_mapped(f2_fn, self.mesh)
                f2_stats_fn = batch_shard_mapped(
                    f2_stats_fn, self.mesh, stat_outputs=2
                )
            if train:
                x, s10, q10 = f2_stats_fn(x, w_eff, corr, alpha)
                bn10_stats = (s10, q10)
            else:
                x = f2_fn(x, w_eff, corr, alpha)
                bn10_stats = None
        else:
            x = bn_conv(x, "cnn_6", "cnn_7", False, self.ochannels3, 3, 1)
            x, bn10_stats = prelu_pool(x, "cnn_8", train and self.fold_bn)
        x = bn_conv(
            x, "cnn_10", "cnn_11", False, self.ochannels4, 3, 1,
            stats=bn10_stats,
        )
        x = PReLU(name="cnn_12")(x)
        x = bn_conv(x, "cnn_13", "cnn_14", False, self.ochannels5, 3, 1)
        x = PReLU(name="cnn_15")(x)
        x = bn_conv(x, "cnn_16", "cnn_17", False, 64, 3, 1)
        # pool3 feeds the dropout/transpose, not a BatchNorm: no stats
        x, _ = prelu_pool(x, "cnn_18", False)
        if self.with_dropout:
            x = Dropout(self.dropout_cnn, name="cnn_drop")(x, train)

        # NHWC [B, T/8, 32, 64] -> treat time as channels:
        # NHWC [B, 64, 32, T/8] (reference permute models.py:307).
        x = jnp.transpose(x, (0, 3, 2, 1))

        if self.with_dilation:
            x = bn_conv(x, "dil_0", "dil_1", True, self.time_dim, 3, 1, 1)
            x = PReLU(name="dil_2")(x)
            x = bn_conv(x, "dil_3", "dil_4", True, self.time_dim, 5, 2, 2)
            x = PReLU(name="dil_5")(x)
            x = bn_conv(x, "dil_6", "dil_7", True, self.time_dim, 7, 2, 4)
            x = PReLU(name="dil_8")(x)
            if self.with_dropout:
                x = Dropout(self.dropout_lstm, name="dil_drop")(x, train)

        # Flatten(2) + Linear + mean over the time axis
        # NHWC [B, H', W', T/8] -> [B, T/8, H'*W'] in torch (H, W) order.
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, x.shape[-1], -1)
        # flax Dense would silently infer the input width, but the
        # reference's Linear(flattend_size, 2) fails on a geometry mismatch
        # (models.py:311) — keep that contract so config errors surface at
        # trace time (and so check_dimensions can reject invalid modules).
        if x.shape[-1] != self.flattend_size:
            raise ValueError(
                f"flattend_size={self.flattend_size} does not match the "
                f"flattened feature width {x.shape[-1]} for this input "
                "geometry"
            )
        x = nn.Dense(self.nclasses, name="fc_1", dtype=self.dtype)(x)
        return jnp.mean(x, axis=1).astype(jnp.float32)

    def get_name(self) -> str:
        if not self.with_dilation:
            return "DCNNxDilation"
        if not self.with_dropout:
            return "DCNNxDropout"
        return "DCNN"


def DCNNxDropout(**kwargs) -> DCNN:
    """DCNN ablation without dropout (reference models.py:320-395)."""
    kwargs.setdefault("with_dropout", False)
    return DCNN(**kwargs)


def DCNNxDilation(**kwargs) -> DCNN:
    """DCNN ablation without the dilated block (reference models.py:398-459)."""
    kwargs.setdefault("with_dilation", False)
    return DCNN(**kwargs)
