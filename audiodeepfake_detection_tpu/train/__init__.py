"""Training: steps, trainer, metrics, transforms, experiment driver."""

from .metrics import (  # noqa: F401
    calculate_acc_dict,
    calculate_acc_label,
    calculate_eer,
)
from .export import export_scorer, load_artifact, save_artifact  # noqa: F401
from .predict import make_score_fn, score_files  # noqa: F401
from .results import print_paper_tables, print_results  # noqa: F401
from .steps import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from .trainer import Trainer  # noqa: F401
from .transforms import (  # noqa: F401
    get_transforms,
    make_transform,
    normalized_transform,
)
