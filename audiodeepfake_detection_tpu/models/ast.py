"""Audio Spectrogram Transformer (AST) in flax.

Parity target: the reference's timm-0.4.5-based AST fork
(reference: src/audiofakedetect/models.py:462-707): a DeiT-distilled ViT
backbone whose patch embedding is re-projected to 1 input channel with
stride (fstride, tstride) = (10, 10) over 16x16 patches, plus positional
embedding cut/interpolation surgery for (256, 101) spectrogram inputs; the
prediction is the mean of the class and distillation tokens through a
LayerNorm+Linear head.

The backbone here is a from-scratch flax ViT (MXU-friendly fused qkv,
bfloat16-capable); timm DeiT weights can be imported from a ``.pt`` state
dict via :func:`import_timm_deit` which performs the same channel-sum and
pos-embed surgery as the reference (models.py:585-651).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_SIZES = {
    "tiny224": dict(embed_dim=192, depth=12, num_heads=3),
    "small224": dict(embed_dim=384, depth=12, num_heads=6),
    "base224": dict(embed_dim=768, depth=12, num_heads=12),
    "base384": dict(embed_dim=768, depth=12, num_heads=12),
}


def ast_patch_grid(
    fstride: int, tstride: int, input_fdim: int, input_tdim: int, patch: int = 16
) -> tuple[int, int]:
    """Number of patches along (freq, time) (reference get_shape, models.py:665-677)."""
    f_dim = (input_fdim - patch) // fstride + 1
    t_dim = (input_tdim - patch) // tstride + 1
    return f_dim, t_dim


class _DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample
    (timm drop_path; present in the reference's timm-0.4.5 blocks)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(
            rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1)
        )
        return x * mask.astype(x.dtype) / keep


class _Int8Dense(nn.Module):
    """Param-compatible ``nn.Dense`` running on the int8 MXU path.

    Declares the same ``kernel``/``bias`` tree as ``nn.Dense`` (trained
    variables slot straight in) but computes ``x @ W`` as s8xs8->s32 with
    per-output-column weight scales (ops/quantize.py).  Inference-only:
    the straight-through rounding has no gradient.
    """

    features: int
    act_scale: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.quantize import (
            dense_int8_weights,
            quantized_dense,
            site_baked,
        )

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # baked int8 weights (bake_int8_weights): the serving forward reads
        # the int8 kernel from HBM and never touches the fp master
        baked = site_baked(self, "w", lambda: dense_int8_weights(kernel))
        y = quantized_dense(
            x, kernel, self.act_scale, out_dtype=x.dtype, baked=baked
        )
        return y + bias.astype(x.dtype)


class _Block(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    # timm-0.4.5 DeiT defaults: all dropout rates 0 — the hooks exist so
    # training configs can enable them, exactly like the reference backbone
    # (timm Block: attn_drop / proj drop / mlp drop / drop_path).
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None
    precision: Any = None  # None -> fp32-exact (HIGHEST), like DCNN/LCNN
    # Fuse softmax(qk^T)v into one Pallas kernel (ops/flash_attention.py):
    # the [B, H, N, N] score tensor never exists in HBM in either direction
    # (the AST step is bandwidth-bound; scores are its largest eliminable
    # traffic).  Requires attn_drop_rate == 0 and no tensor-parallel head
    # sharding (an unpartitioned Pallas call would be replicated by GSPMD).
    fused_attention: bool = False
    # Post-training int8 (inference): "calibrate" sows each Dense input's
    # absmax into "quant_obs"; a {site: scale} dict (keys "qkv"/"proj"/
    # "fc1"/"fc2") runs those matmuls on the int8 MXU (ops/quantize.py).
    quant: Any = None

    def _q(self, name: str, x: jnp.ndarray):
        """Calibration sow / calibrated activation scale for one site."""
        from ..ops.quantize import site_scale

        return site_scale(self, self.quant, name, x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        prec = (
            jax.lax.Precision.HIGHEST
            if self.precision is None
            else self.precision
        )

        def Dense(feat, name, inp):
            scale = self._q(name, inp)
            if scale is not None:
                return _Int8Dense(feat, scale, name=name)(inp)
            return nn.Dense(
                feat, name=name, dtype=self.dtype, precision=prec
            )(inp)

        drop_path = _DropPath(self.drop_path_rate, name="drop_path")
        h = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=self.dtype)(x)
        b, n, d = h.shape
        qkv = Dense(3 * d, "qkv", h)
        if self.fused_attention and self.attn_drop_rate == 0.0:
            from ..ops.flash_attention import flash_mha_packed

            # the kernel consumes the Dense output's natural [B, N, 3HD]
            # layout directly — no transposes materialise around the call
            h = flash_mha_packed(
                qkv,
                self.num_heads,
                1.0 / math.sqrt(d // self.num_heads),
                prec,
            )
        else:
            qkv = qkv.reshape(b, n, 3, self.num_heads, d // self.num_heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            attn = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, precision=prec
            ) / math.sqrt(d // self.num_heads)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop_rate, deterministic=not train)(
                attn
            )
            h = jnp.einsum(
                "bhnm,bmhd->bnhd", attn, v, precision=prec
            ).reshape(b, n, d)
        h = Dense(d, "proj", h)
        h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        x = x + drop_path(h, train)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=self.dtype)(x)
        h = Dense(int(d * self.mlp_ratio), "fc1", h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        h = Dense(d, "fc2", h)
        h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        return x + drop_path(h, train)


class ASTModel(nn.Module):
    """AST: patch-embed spectrogram + DeiT encoder + dual-token head."""

    label_dim: int = 2
    fstride: int = 10
    tstride: int = 10
    input_fdim: int = 256
    input_tdim: int = 101
    model_size: str = "base384"
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None
    precision: Any = None  # None -> fp32-exact (HIGHEST), like DCNN/LCNN
    # fuse softmax(qk^T)v per block into one Pallas kernel — see _Block
    fused_attention: bool = False
    # rematerialize each encoder block on the backward pass
    # (jax.checkpoint): trades ~1/3 more FLOPs for not saving the block
    # activations — a memory lever for large batch / long token counts.
    # Measured A/B on v5e: see docs/benchmarks.md (the AST is
    # compute-bound at batch 32, so remat is off by default).
    remat_blocks: bool = False
    # named jax.checkpoint_policies policy for selective remat (implies
    # remat_blocks), e.g. "dots_saveable": matmul outputs are saved,
    # only elementwise/VPU work (LayerNorm, GELU, softmax) recomputes —
    # cheaper backward than full remat. Measured A/B: docs/benchmarks.md.
    remat_policy: Any = None
    # Post-training int8 quantization (inference only, ops/quantize.py):
    # "calibrate" records each block Dense input's absmax into the
    # "quant_obs" collection; a {"block_i/site": act_scale} dict (sites
    # qkv/proj/fc1/fc2 — ~94% of the forward FLOPs) runs those matmuls as
    # s8xs8->s32 on the MXU.  Patch embed and head stay in the working
    # dtype.  Requires train=False (int8 rounding has no gradient).
    quant: Any = None

    def setup(self) -> None:
        # setup-style (not @nn.compact) so the three phases — embed /
        # encode / classify — are separately apply-able: the pipeline-
        # parallel runtime (parallel/pipeline.py) runs embed+classify
        # replicated and circulates only the encoder blocks across stages.
        # Param names match the previous compact layout exactly (the
        # timm importer and TP layouts key on them).
        prec = (
            jax.lax.Precision.HIGHEST
            if self.precision is None
            else self.precision
        )
        cfg = _SIZES[self.model_size]
        d = cfg["embed_dim"]
        f_dim, t_dim = ast_patch_grid(
            self.fstride, self.tstride, self.input_fdim, self.input_tdim
        )
        self._num_patches = f_dim * t_dim
        self._embed_dim = d
        self.patch_proj = nn.Conv(
            d,
            kernel_size=(16, 16),
            strides=(self.fstride, self.tstride),
            padding="VALID",
            name="patch_proj",
            dtype=self.dtype,
            precision=prec,
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, d)
        )
        self.dist_token = self.param(
            "dist_token", nn.initializers.zeros, (1, 1, d)
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, self._num_patches + 2, d),
        )
        self.pos_drop = nn.Dropout(self.drop_rate)
        # stochastic depth scales linearly over depth, the timm rule
        if self.remat_policy is not None:
            policy = (
                getattr(jax.checkpoint_policies, self.remat_policy)
                if isinstance(self.remat_policy, str)
                else self.remat_policy
            )
            block_cls = nn.remat(_Block, static_argnums=(2,), policy=policy)
        elif self.remat_blocks:
            block_cls = nn.remat(_Block, static_argnums=(2,))
        else:
            block_cls = _Block
        from collections.abc import Mapping

        def block_quant(i: int):
            if self.quant == "calibrate":
                return "calibrate"
            if isinstance(self.quant, Mapping):
                pre = f"block_{i}/"
                sub = {
                    k[len(pre):]: v
                    for k, v in self.quant.items()
                    if k.startswith(pre)
                }
                return sub or None
            return None

        self.blocks = [
            block_cls(
                d,
                cfg["num_heads"],
                drop_rate=self.drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rate=(
                    self.drop_path_rate * i / max(cfg["depth"] - 1, 1)
                ),
                name=f"block_{i}",
                dtype=self.dtype,
                precision=self.precision,
                fused_attention=self.fused_attention,
                quant=block_quant(i),
            )
            for i in range(cfg["depth"])
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        # reference mlp_head LayerNorm is a plain torch nn.LayerNorm —
        # default eps 1e-5, unlike the timm backbone's 1e-6 norms
        # (reference models.py:568-571)
        self.head_norm = nn.LayerNorm(epsilon=1e-5, name="head_norm")
        self.head = nn.Dense(self.label_dim, name="head")

    def embed(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[B, 1, F, T] spectrogram -> [B, num_patches + 2, D] tokens."""
        b = x.shape[0]
        # [B, 1, F, T] -> NHWC, conv patch embed with overlap stride
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.patch_proj(h)
        h = h.reshape(b, self._num_patches, self._embed_dim)
        h = jnp.concatenate(
            [
                jnp.tile(self.cls_token, (b, 1, 1)),
                jnp.tile(self.dist_token, (b, 1, 1)),
                h,
            ],
            axis=1,
        )
        h = h + self.pos_embed
        if self.dtype is not None:
            # keep the residual token stream in the compute dtype: the
            # fp32 cls/dist/pos_embed params otherwise promote it to f32
            # and every residual add / LayerNorm in all 12 blocks pays
            # doubled HBM traffic (params and LN stats stay fp32)
            h = h.astype(self.dtype)
        # reference forward applies the backbone's pos_drop here
        # (models.py:690; timm drop_rate, 0 by default)
        return self.pos_drop(h, deterministic=not train)

    def encode(self, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """The DeiT encoder: all transformer blocks in sequence."""
        for block in self.blocks:
            # positional `train`: nn.remat's static_argnums needs it
            h = block(h, train)
        return h

    def classify(self, h: jnp.ndarray) -> jnp.ndarray:
        """Encoded tokens -> logits (dual-token mean through the head)."""
        h = self.norm(h)
        h = (h[:, 0] + h[:, 1]) / 2.0
        h = self.head_norm(h)
        return self.head(h)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from collections.abc import Mapping

        if train and isinstance(self.quant, Mapping):
            raise ValueError(
                "quant is inference-only (int8 rounding has no gradient);"
                " call with train=False"
            )
        return self.classify(self.encode(self.embed(x, train), train))

    def get_name(self) -> str:
        return "AST"


def import_timm_deit(
    state: dict,
    fstride: int = 10,
    tstride: int = 10,
    input_fdim: int = 256,
    input_tdim: int = 101,
    model_size: str = "base384",
) -> dict:
    """Convert a timm DeiT-distilled state dict into AST flax params.

    Performs the reference's surgery (models.py:585-651): the patch conv is
    summed over RGB channels to 1 channel; the positional embedding grid is
    cut from the middle or bilinearly interpolated to the (f_dim, t_dim)
    patch grid and re-concatenated with the cls/dist token embeddings.
    """
    cfg = _SIZES[model_size]
    d = cfg["embed_dim"]
    f_dim, t_dim = ast_patch_grid(fstride, tstride, input_fdim, input_tdim)

    # A trained reference AST snapshot prefixes the backbone with "v."
    # (self.v, models.py:548-565) and possibly "module." from DDP wrapping;
    # a raw timm DeiT state dict has neither.  Normalize to timm layout.
    def strip(key: str) -> str:
        while key.startswith("module."):  # DDP saves wrap twice
            key = key[len("module."):]
        if key.startswith("v."):
            key = key[len("v."):]
        return key

    # Copy at the boundary: ``Tensor.numpy()`` views alias live torch
    # parameter memory (see torch_import._owned_state) and the translations
    # below are numpy views of these buffers.
    state = {strip(k): np.array(v) for k, v in state.items()}

    params: dict = {}
    # patch embedding: torch conv [D, C, 16, 16] -> sum ch -> flax [16,16,1,D]
    # (a reference snapshot's conv is already single-channel; summing is
    # then the identity)
    w = np.asarray(state["patch_embed.proj.weight"]).sum(1, keepdims=True)
    params["patch_proj"] = {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": np.asarray(state["patch_embed.proj.bias"]),
    }
    params["cls_token"] = np.asarray(state["cls_token"])
    params["dist_token"] = np.asarray(state["dist_token"])

    pos = np.asarray(state["pos_embed"])  # [1, 2 + P, D]
    orig_p = pos.shape[1] - 2
    if orig_p == f_dim * t_dim:
        # already surgically adapted (a trained reference AST snapshot)
        params["pos_embed"] = pos
    else:
        hw = int(math.isqrt(orig_p))
        grid = pos[:, 2:].reshape(1, hw, hw, d)
        # time axis: cut from the middle or interpolate
        # (reference models.py:612-631; torch interpolate(bilinear,
        # align_corners=False) == jax.image.resize "bilinear")
        if t_dim <= hw:
            start = hw // 2 - t_dim // 2
            grid = grid[:, :, start : start + t_dim]
        else:
            grid = jax.image.resize(grid, (1, hw, t_dim, d), "bilinear")
        if f_dim <= hw:
            start = hw // 2 - f_dim // 2
            grid = grid[:, start : start + f_dim]
        else:
            grid = jax.image.resize(grid, (1, f_dim, t_dim, d), "bilinear")
        params["pos_embed"] = np.concatenate(
            [pos[:, :2], np.asarray(grid).reshape(1, f_dim * t_dim, d)], axis=1
        )

    for i in range(cfg["depth"]):
        pre = f"blocks.{i}."
        params[f"block_{i}"] = {
            "norm1": {
                "scale": np.asarray(state[pre + "norm1.weight"]),
                "bias": np.asarray(state[pre + "norm1.bias"]),
            },
            "qkv": {
                "kernel": np.asarray(state[pre + "attn.qkv.weight"]).T,
                "bias": np.asarray(state[pre + "attn.qkv.bias"]),
            },
            "proj": {
                "kernel": np.asarray(state[pre + "attn.proj.weight"]).T,
                "bias": np.asarray(state[pre + "attn.proj.bias"]),
            },
            "norm2": {
                "scale": np.asarray(state[pre + "norm2.weight"]),
                "bias": np.asarray(state[pre + "norm2.bias"]),
            },
            "fc1": {
                "kernel": np.asarray(state[pre + "mlp.fc1.weight"]).T,
                "bias": np.asarray(state[pre + "mlp.fc1.bias"]),
            },
            "fc2": {
                "kernel": np.asarray(state[pre + "mlp.fc2.weight"]).T,
                "bias": np.asarray(state[pre + "mlp.fc2.bias"]),
            },
        }
    params["norm"] = {
        "scale": np.asarray(state["norm.weight"]),
        "bias": np.asarray(state["norm.bias"]),
    }
    # classification head: the reference's fresh mlp_head
    # (LayerNorm + Linear, models.py:572-575) — present in trained AST
    # snapshots, absent from raw timm dicts (timm's ImageNet "head"/
    # "head_dist" have the wrong output dim and are discarded, like the
    # reference discards them by building mlp_head anew).
    if "mlp_head.0.weight" in state:
        params["head_norm"] = {
            "scale": np.asarray(state["mlp_head.0.weight"]),
            "bias": np.asarray(state["mlp_head.0.bias"]),
        }
        params["head"] = {
            "kernel": np.asarray(state["mlp_head.1.weight"]).T,
            "bias": np.asarray(state["mlp_head.1.bias"]),
        }
    return {"params": params}
