"""Classifier models (flax) + torch checkpoint interop."""

from .ast import ASTModel, import_timm_deit  # noqa: F401
from .dcnn import DCNN, DCNNxDilation, DCNNxDropout  # noqa: F401
from .factory import check_dimensions, compute_parameter_total, get_model  # noqa: F401
from .gridmodel import GridModelWrapper, get_gridsearch_model, parse_model_str  # noqa: F401
from .lcnn import LCNN  # noqa: F401
from .regression import Regression  # noqa: F401
from .torch_import import (  # noqa: F401
    export_state_dict,
    import_dcnn,
    import_lcnn,
    load_epochs_run,
    load_torch_state_dict,
)
