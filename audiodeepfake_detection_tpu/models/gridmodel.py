"""String-defined "grid model": parse layer-spec strings into flax modules.

Parity target: the reference's ``GridModelWrapper`` + ``parse_model*`` +
``parse_sequential`` (reference: src/audiofakedetect/models.py:39-65,
768-1018).  A model is described as a list of blocks; each block has a
``layers`` list of strings like ``"Conv2d 1 [64,32,128] 2 1 2"`` where a
bracketed list means "one variant per entry" — the parser expands the grid
of variants; inter-block ``transforms`` are callables applied between
blocks.

Supported layer vocabulary (the set the reference's configs use):
``Conv2d in out k [stride [padding]]``, ``MaxPool2d k s``,
``SyncBatchNorm n [affine]``, ``BatchNorm2d n``, ``Dropout p``,
``Linear in out``, ``ReLU``, ``Softmax dim``, ``Flatten [start]``,
``MaxFeatureMap2D``, ``BLSTMLayer in out``, ``Permute a,b,c,d``.
"""

from __future__ import annotations

import ast
from copy import copy
from typing import Any, Callable, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    BatchNorm,
    BLSTMLayer,
    Conv2d,
    Dropout,
    max_feature_map_2d,
    PReLU,
)


def parse_model_str(model_str: list) -> list:
    """Expand bracketed alternatives into per-variant layer lists.

    Follows the reference's expansion semantics (models.py:875-966): each
    layer string may contain bracketed lists; all bracketed lists within one
    layer must have equal length N and produce N variants; single-variant
    layers are appended to every variant.
    """
    parsed_output: list = []
    for element in model_str:
        postfix = None
        if isinstance(element, list):
            postfix = element[0]
            element = element[-1]
        if not isinstance(element, str):
            raise RuntimeError(f"Model string invalid at {element}.")
        split = element.split()
        element_parts: List[Any] = [ast.literal_eval(p) for p in split[1:]]
        element_parts.insert(0, split[0])

        output_els = 1
        for part in element_parts:
            if isinstance(part, list):
                output_els = len(part)
                break

        new_elements = []
        for i in range(output_els):
            out_list: List[Any] = []
            for part in element_parts:
                if isinstance(part, list):
                    if output_els != len(part):
                        raise RuntimeError(
                            "Model layers must contain the same amount of "
                            f"elements. Expected {output_els}, but got "
                            f"{len(part)}."
                        )
                    part = part[i]
                out_list.append(str(part).replace(" ", ""))
            if postfix is not None:
                out_list = [postfix, out_list]
            new_elements.append(out_list)

        last_layer = copy(parsed_output[-1]) if parsed_output else None
        for i in range(len(new_elements)):
            if len(parsed_output) == 0:
                parsed_output = [[new_elements[i]]]
            elif len(parsed_output) < i + 1:
                layer = copy(last_layer) if last_layer is not None else []
                layer = list(layer)
                layer.append(new_elements[i])
                parsed_output.append(layer)
            else:
                if len(new_elements) == 1:
                    for part in parsed_output:
                        part.append(new_elements[i])
                else:
                    parsed_output[i].append(new_elements[i])
    return parsed_output


def parse_model(model_data: list) -> list:
    """Expand every block's layer grid; returns the extended model list."""
    for i in range(len(model_data)):
        new_els: List[Any] = []
        for j in range(len(model_data[i])):
            trials = parse_model_str(model_data[i][j]["layers"])
            model_data[i][j]["layers"] = trials[0]
            if len(trials) > 1:
                for k in range(1, len(trials)):
                    if len(new_els) < len(trials) - 1:
                        config_copy = [dict(part) for part in model_data[i]]
                        config_copy[j]["layers"] = trials[k]
                        new_els.append(config_copy)
                    elif len(new_els) == len(trials) - 1:
                        new_els[k - 1][j]["layers"] = trials[k]
                    else:
                        raise RuntimeError("Parsing error")
            elif len(new_els) > 0:
                for k in range(len(new_els)):
                    new_els[k][j]["layers"] = trials[0]
        model_data.extend(new_els)
    return model_data


class _SpecSequential(nn.Module):
    """Execute a list of parsed layer specs in order."""

    specs: Tuple[Tuple[str, ...], ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for li, spec in enumerate(self.specs):
            kind, args = spec[0], [ast.literal_eval(a) for a in spec[1:]]
            name = f"l{li}_{kind}"
            if kind == "Conv2d":
                _in, out, k = args[0], args[1], args[2]
                stride = args[3] if len(args) > 3 else 1
                padding = args[4] if len(args) > 4 else 0
                # NCHW spec -> NHWC compute
                x = jnp.transpose(x, (0, 2, 3, 1))
                x = Conv2d(out, k, stride=stride, padding=padding, name=name)(x)
                x = jnp.transpose(x, (0, 3, 1, 2))
            elif kind == "MaxPool2d":
                k = args[0]
                s = args[1] if len(args) > 1 else k
                x = jnp.transpose(x, (0, 2, 3, 1))
                x = nn.max_pool(x, window_shape=(k, k), strides=(s, s))
                x = jnp.transpose(x, (0, 3, 1, 2))
            elif kind in ("SyncBatchNorm", "BatchNorm2d"):
                affine = bool(args[1]) if len(args) > 1 else True
                x = jnp.moveaxis(x, 1, -1)
                x = BatchNorm(affine=affine, name=name)(x, train)
                x = jnp.moveaxis(x, -1, 1)
            elif kind == "Dropout":
                x = Dropout(float(args[0]), name=name)(x, train)
            elif kind == "Linear":
                x = nn.Dense(int(args[1]), name=name)(x)
            elif kind == "ReLU":
                x = nn.relu(x)
            elif kind == "PReLU":
                x = PReLU(name=name)(x)
            elif kind == "Softmax":
                x = nn.softmax(x, axis=int(args[0]) if args else -1)
            elif kind == "LogSoftmax":
                x = nn.log_softmax(x, axis=int(args[0]) if args else -1)
            elif kind == "Flatten":
                start = int(args[0]) if args else 1
                x = x.reshape(*x.shape[:start], -1)
            elif kind == "MaxFeatureMap2D":
                x = jnp.moveaxis(x, 1, -1)
                x = max_feature_map_2d(x)
                x = jnp.moveaxis(x, -1, 1)
            elif kind == "BLSTMLayer":
                x = BLSTMLayer(int(args[0]), int(args[1]), name=name)(x)
            elif kind == "Permute":
                dims = [int(d) for d in str(spec[1]).split(",")]
                x = jnp.transpose(x, dims)
            else:
                raise RuntimeError(f"Given layer type {kind} not found.")
        return x


def _normalize_spec(layer) -> Tuple[str, ...]:
    if isinstance(layer, list) and layer and not isinstance(layer[0], str):
        # [module, [name, args...]] form (e.g. torchvision.ops Permute)
        layer = layer[1]
    if isinstance(layer, list):
        return tuple(str(p) for p in layer)
    return tuple(str(layer).split())


class GridModelWrapper(nn.Module):
    """Sequential blocks with host-side transforms in between
    (reference models.py:39-65)."""

    blocks: Tuple[Tuple[Tuple[str, ...], ...], ...]
    transforms: Tuple[Tuple[Callable, ...], ...] = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, block in enumerate(self.blocks):
            x = _SpecSequential(block, name=f"block_{i}")(x, train)
            if i < len(self.transforms):
                for fn in self.transforms[i]:
                    x = fn(x)
        return x

    def get_name(self) -> str:
        return "GridModel"


def get_gridsearch_model(model_data: list) -> GridModelWrapper:
    """Build the first expanded variant as a flax module
    (reference models.py:768-807)."""
    model_data = parse_model([list(md) for md in model_data])
    variant = model_data[0]
    blocks = []
    transforms = []
    for block_cfg in variant:
        blocks.append(tuple(_normalize_spec(s) for s in block_cfg["layers"]))
        transforms.append(tuple(block_cfg.get("transforms", ())))
    return GridModelWrapper(blocks=tuple(blocks), transforms=tuple(transforms))
