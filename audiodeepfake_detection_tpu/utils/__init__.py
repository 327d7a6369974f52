"""Config, experiment grid, seeding, naming helpers."""

from .config import (  # noqa: F401
    DotDict,
    Griderator,
    build_new_grid,
    default_config,
    load_grid_config,
)
from .naming import experiment_model_file, tensorboard_dir  # noqa: F401
