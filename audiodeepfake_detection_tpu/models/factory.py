"""Model factory: experiment config -> flax model instance.

Parity target: reference ``get_model`` (src/audiofakedetect/models.py:710-765)
with the same model-name vocabulary:

* ``"lcnn"``      — LCNN with lstm_channels derived from the feature mode
                    (doubledelta 60 / delta 40 / lfcc 20 / else num_of_scales);
* ``"gridmodel"`` — string-defined model from ``args.model_data``;
* ``"modules"``   — a DCNN-family class named by ``args.module`` (the
                    reference injects the class object through the exec'd
                    config; here a string name or a callable both work).
"""

from __future__ import annotations

from typing import Any, Union

from ..utils.config import DotDict
from .dcnn import DCNN
from .gridmodel import get_gridsearch_model
from .lcnn import LCNN
from .regression import Regression

_MODULE_REGISTRY = {
    "DCNN": dict(with_dropout=True, with_dilation=True),
    "DCNNxDropout": dict(with_dropout=False, with_dilation=True),
    "DCNNxDilation": dict(with_dropout=True, with_dilation=False),
}


def _tri_flag(value):
    """Tri-state fused-kernel flag: False / True (train-only) / "always".

    Config files are .py/.json dicts, so string spellings are the expected
    vocabulary: "always" keeps the force-in-eval mode (``bool("always")``
    would collapse it to train-only True), and the explicit off-spellings
    ("off"/"false"/"no"/"0"/"train") map to their meanings instead of the
    truthy-string trap ``bool("off") == True``.
    """
    s = str(value).strip().lower()
    if s == "always":
        return "always"
    if s in ("off", "false", "no", "none", "0", ""):
        return False
    if s in ("train", "on", "true", "yes", "1"):
        return True
    return bool(value)


def _dtype_precision(args: DotDict):
    """(dtype, precision) for the configured compute mode: bf16 speed mode
    gets ``Precision.DEFAULT`` MXU passes; fp32 stays exact (None ->
    HIGHEST inside the models)."""
    import jax.numpy as jnp

    dtype = {"bfloat16": jnp.bfloat16}.get(str(args.dtype), None)
    if dtype is None:
        return None, None
    import jax

    return dtype, jax.lax.Precision.DEFAULT


def _build_dcnn(
    args: DotDict, variant: str, nclasses: int, in_channels: int, mesh=None
) -> DCNN:
    time_dim = int(args.input_dim[-1]) // 8 + int(args.time_dim_add or 0)
    dtype, precision = _dtype_precision(args)
    return DCNN(
        dtype=dtype,
        precision=precision,
        fused_layer1=_tri_flag(args.fused_layer1),
        fused_pool=_tri_flag(args.fused_pool),
        fused_layer2=_tri_flag(args.fused_layer2),
        mesh=mesh,
        in_channels=in_channels,
        ochannels1=args.ochannels1 or 64,
        ochannels2=args.ochannels2 or 64,
        ochannels3=args.ochannels3 or 96,
        ochannels4=args.ochannels4 or 128,
        ochannels5=args.ochannels5 or 32,
        kernel1=args.kernel1 or 3,
        time_dim=time_dim,
        flattend_size=args.flattend_size or 320,
        dropout_cnn=args.dropout_cnn if args.dropout_cnn is not None else 0.6,
        dropout_lstm=args.dropout_lstm if args.dropout_lstm is not None else 0.2,
        nclasses=nclasses,
        **_MODULE_REGISTRY[variant],
    )


def _build_ast(args: DotDict, nclasses: int):
    """AST through the driver (reference reaches it as a "modules" class
    injected via the exec'd grid config, gridsearch_config.py:127 +
    models.py:760-762).

    Geometry parity with the reference constructor (models.py:497-536):
    ``input_tdim`` comes from ``args.flattend_size`` (the reference
    repurposes that key for AST), ``input_fdim`` defaults to 256.  When the
    driver has probed ``args.input_dim`` we take the actual (F, T) from it
    instead — identical for the reference's 256-scale configs, and correct
    for every other geometry (the reference would crash on those).
    ``ast_model_size`` / ``ast_drop_*`` keys expose the constructor knobs
    the reference hardcodes; ``ast_remat`` rematerializes encoder blocks on
    the backward pass (activation-memory lever for large batch / long
    token counts), ``ast_remat_policy`` selects a named
    ``jax.checkpoint_policies`` selective-remat policy (e.g.
    ``"dots_saveable"`` — matmul outputs saved, elementwise recomputed;
    implies remat) and ``ast_fused_attention`` switches each block's
    softmax(qk^T)v to the Pallas kernel (pays off only for sequences long
    enough that attention scores spill VMEM — see docs/benchmarks.md).
    """
    from .ast import ASTModel

    dtype, precision = _dtype_precision(args)
    input_dim = args.input_dim
    input_fdim = int(input_dim[-2]) if input_dim else 256
    if args.flattend_size:
        input_tdim = int(args.flattend_size)
    elif input_dim:
        input_tdim = int(input_dim[-1])
    else:
        input_tdim = 101
    return ASTModel(
        label_dim=nclasses,
        input_fdim=input_fdim,
        input_tdim=input_tdim,
        model_size=str(args.ast_model_size or "base384"),
        drop_rate=float(args.ast_drop_rate or 0.0),
        attn_drop_rate=float(args.ast_attn_drop_rate or 0.0),
        drop_path_rate=float(args.ast_drop_path_rate or 0.0),
        fused_attention=bool(args.ast_fused_attention),
        remat_blocks=bool(args.ast_remat),
        remat_policy=args.ast_remat_policy or None,
        dtype=dtype,
        precision=precision,
    )


def get_model(
    args: DotDict,
    model_name: str,
    nclasses: int = 2,
    in_channels: int = 1,
    lead: bool = False,
    mesh=None,
) -> Union[LCNN, Any]:
    """Build the model named by ``model_name`` from the experiment config."""
    if model_name == "lcnn":
        features = args.features or "none"
        if "doubledelta" in features:
            lstm_channels = 60
        elif "delta" in features:
            lstm_channels = 40
        elif "lfcc" in features:
            lstm_channels = 20
        else:
            lstm_channels = int(args.num_of_scales)
        dtype, precision = _dtype_precision(args)
        return LCNN(
            classes=nclasses,
            in_channels=in_channels,
            lstm_channels=lstm_channels,
            dtype=dtype,
            precision=precision,
            fused_layer1=_tri_flag(args.fused_layer1),
            mesh=mesh,
        )
    if model_name == "gridmodel":
        if args.model_data is None:
            raise RuntimeError(
                "Config dict does not contain the key model_data,"
                "which should hold the list like model structure."
            )
        return get_gridsearch_model(args.model_data)
    if model_name == "modules":
        module = args.module
        if callable(module) and not isinstance(module, str):
            name = getattr(module, "__name__", None) or str(module)
        else:
            name = str(module)
        if name in _MODULE_REGISTRY:
            model = _build_dcnn(args, name, nclasses, in_channels, mesh=mesh)
        elif name in ("AST", "ASTModel"):
            model = _build_ast(args, nclasses)
        elif name == "Regression":
            model = Regression(nclasses=nclasses)
        elif callable(module):
            model = module(args)
        else:
            raise RuntimeError(f"Unknown module {name!r}.")
        # The reference validates modular models against the probed input
        # shape before accepting them (models.py:760-762, via torchsummary);
        # jax.eval_shape gives the same gate without spending FLOPs.
        if args.input_dim is not None and not check_dimensions(
            model, tuple(args.input_dim[1:]), verbose=lead
        ):
            raise RuntimeError("Model not valid.")
        return model
    raise RuntimeError(f"Model with model string '{model_name}' does not exist.")


def compute_parameter_total(variables) -> int:
    """Count trainable parameters (reference models.py:20-36)."""
    import numpy as np

    params = variables.get("params", variables)
    total = 0
    for leaf in __import__("jax").tree.leaves(params):
        total += int(np.prod(np.shape(leaf)))
    return total


def check_dimensions(model, input_shape, verbose: bool = True) -> bool:
    """Validate a model against an input shape via abstract evaluation
    (reference models.py:1006-1018 uses torchsummary; here jax.eval_shape —
    no FLOPs spent)."""
    import jax
    import jax.numpy as jnp

    try:
        x = jnp.zeros((1, *input_shape), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.key(0), x, train=False)
        )
        out = jax.eval_shape(
            lambda v: model.apply(v, x, train=False), variables
        )
        if verbose:
            print(f"model ok: input {x.shape} -> output {out.shape}")
        return True
    except Exception as exc:
        if verbose:
            print(f"Error: {exc}")
        return False
