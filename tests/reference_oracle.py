"""Helpers to run the *reference* PyTorch models as numeric oracles in tests.

The read-only reference checkout at ``/root/reference`` is imported with its
missing heavy dependencies (torchaudio, timm, torchsummary, tqdm, ptwt,
pywt, torchvision) stubbed out, so its pure-torch model classes can be
instantiated on CPU and compared against the flax re-implementations.  This
gives true golden-output parity tests without copying any reference code.
"""

from __future__ import annotations

import sys
import types

REFERENCE_SRC = "/root/reference/src"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load_reference_models():
    """Import ``audiofakedetect.models`` from the reference with stubs.

    Returns the module, or None when the reference checkout is unavailable.
    """
    import os

    if not os.path.isdir(REFERENCE_SRC):
        return None
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)

    # --- stub out the reference's unavailable dependencies -----------------
    def _identity(x, *a, **k):
        return x

    class _FakeTqdm:
        def __init__(self, it=None, *a, **k):
            self._it = it or []

        def __iter__(self):
            return iter(self._it)

        def set_description(self, *a, **k):
            pass

    _stub("tqdm", tqdm=_FakeTqdm)
    _stub("torchaudio", functional=_stub("torchaudio.functional"))
    _stub("torchaudio.transforms")
    _stub("torchsummary", summary=_identity)
    timm = _stub("timm", __version__="0.4.5", create_model=_identity)
    timm.models = _stub("timm.models")
    timm.models.vision_transformer = _stub(
        "timm.models.vision_transformer", PatchEmbed=object
    )
    _stub(
        "timm.models.layers",
        to_2tuple=lambda v: v if isinstance(v, tuple) else (v, v),
        trunc_normal_=_identity,
    )
    _stub("ptwt")
    _stub("pywt", Wavelet=lambda name: name)
    _stub("torchvision", transforms=_stub("torchvision.transforms"))

    import importlib

    return importlib.import_module("audiofakedetect.models")


def reference_dcnn(variant: str = "DCNN", **args):
    """Instantiate a reference DCNN-family model from a config dict."""
    models = load_reference_models()
    if models is None:
        return None
    from audiofakedetect.utils import DotDict  # type: ignore

    defaults = dict(
        input_dim=[128, 1, 256, 101],
        ochannels1=64,
        ochannels2=64,
        ochannels3=96,
        ochannels4=128,
        ochannels5=32,
        kernel1=3,
        time_dim_add=0,
        dropout_cnn=0.6,
        dropout_lstm=0.2,
        flattend_size=320,
        ddp=False,
    )
    defaults.update(args)
    cls = getattr(models, variant)
    return cls(DotDict(defaults))
