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
``SyncBatchNorm n [eps [momentum [affine]]]`` (torch positional
vocabulary), ``BatchNorm2d n``, ``Dropout p``,
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


def _layer_alternatives(element) -> List[Any]:
    """All alternatives of ONE layer spec, as normalized token lists.

    A spec is a string ``"Conv2d 1 [64,32] 3"`` (bracketed lists mean "one
    alternative per entry"; all lists in a spec must agree in length) or a
    ``[wrapper, ..., spec]`` pair whose wrapper object is carried through
    untouched.  Tokens are normalized to whitespace-free strings.
    """
    wrapper = None
    if isinstance(element, list):
        wrapper, element = element[0], element[-1]
    if not isinstance(element, str):
        raise RuntimeError(f"Model string invalid at {element}.")
    head, *rest = element.split()
    tokens: List[Any] = [head] + [ast.literal_eval(tok) for tok in rest]
    width = next((len(t) for t in tokens if isinstance(t, list)), 1)

    alternatives = []
    for i in range(width):
        entry: List[str] = []
        for tok in tokens:
            if isinstance(tok, list):
                if len(tok) != width:
                    raise RuntimeError(
                        "Model layers must contain the same amount of "
                        f"elements. Expected {width}, but got {len(tok)}."
                    )
                tok = tok[i]
            entry.append(str(tok).replace(" ", ""))
        alternatives.append([wrapper, entry] if wrapper is not None else entry)
    return alternatives


def parse_model_str(model_str: list) -> list:
    """Expand bracketed alternatives into per-variant layer lists.

    Expansion semantics match the reference contract (models.py:875-966,
    verified against it by oracle tests): alternatives are *zipped*, not
    crossed — variant ``i`` takes the ``i``-th alternative of every
    multi-alternative layer; single-alternative layers go into every
    variant; when a layer introduces more variants than currently exist,
    the new variants start from a snapshot of the last variant's prefix.
    """
    variants: List[list] = []
    for element in model_str:
        alternatives = _layer_alternatives(element)
        if len(alternatives) == 1:
            if variants:
                for variant in variants:
                    variant.append(alternatives[0])
            else:
                variants = [[alternatives[0]]]
            continue
        prefix = copy(variants[-1]) if variants else []
        for i, alt in enumerate(alternatives):
            if i < len(variants):
                variants[i].append(alt)
            else:
                variants.append(list(prefix) + [alt])
    return variants


def parse_model(model_data: list) -> list:
    """Expand every config's per-block layer grids, in place.

    Each config keeps the first variant of every block; further variants
    spawn sibling configs which are appended to ``model_data``.  Variant
    counts are zipped across blocks (mismatched counts beyond the first
    occurrence raise), matching the reference contract (models.py:850-872,
    oracle-tested).
    """
    for config in list(model_data):
        siblings: List[list] = []
        for j, block in enumerate(config):
            trials = parse_model_str(block["layers"])
            block["layers"] = trials[0]
            if len(trials) == 1:
                for sibling in siblings:
                    sibling[j]["layers"] = trials[0]
                continue
            for k, alt in enumerate(trials[1:]):
                if len(siblings) < len(trials) - 1:
                    clone = [dict(b) for b in config]
                    clone[j]["layers"] = alt
                    siblings.append(clone)
                elif len(siblings) == len(trials) - 1:
                    siblings[k][j]["layers"] = alt
                else:
                    raise RuntimeError("Parsing error")
        model_data.extend(siblings)
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
                # torch positional vocabulary: (num_features, eps, momentum,
                # affine) — the reference exec's these specs into torch
                # constructors, so the 2nd slot is EPS, not affine
                eps = float(args[1]) if len(args) > 1 else 1e-5
                momentum = float(args[2]) if len(args) > 2 else 0.1
                affine = bool(args[3]) if len(args) > 3 else True
                x = jnp.moveaxis(x, 1, -1)
                x = BatchNorm(
                    affine=affine, momentum=momentum, eps=eps, name=name
                )(x, train)
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
                # the dims token may be "0,2,1,3" or the literal_eval'd
                # round-trip "(0, 2, 1, 3)" — parse both
                import ast as _ast

                tok = str(spec[1]).strip()
                try:
                    dims = [int(d) for d in _ast.literal_eval(tok)]
                except (ValueError, SyntaxError):
                    dims = [
                        int(d) for d in tok.strip("()[]").split(",") if d
                    ]
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
