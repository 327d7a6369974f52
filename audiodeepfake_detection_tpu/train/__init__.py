"""Training: steps, trainer, metrics, transforms, experiment driver."""

from .metrics import calculate_acc_label, calculate_acc_dict, calculate_eer  # noqa: F401
from .steps import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from .trainer import Trainer  # noqa: F401
from .transforms import get_transforms, make_transform, normalized_transform  # noqa: F401
