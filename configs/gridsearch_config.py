"""Grid-search configuration for the WaveFake/LJSpeech experiments.

Equivalent of the reference's exec'd config
(reference: scripts/gridsearch_config.py:11-232) — a dict of lists whose
cartesian product (seeds prepended) defines the experiment grid.  This
module is *imported* by ``utils.config.load_grid_config``, never exec'd.
"""


def get_config() -> dict:
    """Return the grid config dictionary (values are lists = grid axes)."""
    return {
        "transform": ["packets"],
        "wavelet": ["sym5"],
        "log_scale": [True],
        "learning_rate": [0.0004],
        "weight_decay": [0.001],
        "save_path": ["./data/run1"],
        "data_path": ["./data/fake"],
        "only_use": [["ljspeech", "fbmelgan"]],
        "limit_train": [(55504, 7504, 15504)],  # train, val, test
        "cross_data_path": ["./data/fake"],
        "cross_limit": [(55500, 7304, 14600)],
        "only_test_folders": [["conformer", "jsutmbmelgan", "jsutpwg"]],
        "file_type": ["wav"],
        "dropout_cnn": [0.6],
        "dropout_lstm": [0.2],
        "num_of_scales": [256],
        "seconds": [1],
        "sample_rate": [22050],
        "cross_sources": [
            [
                "ljspeech",
                "melgan",
                "lmelgan",
                "mbmelgan",
                "pwg",
                "waveglow",
                "hifigan",
                "conformer",
                "jsutmbmelgan",
                "jsutpwg",
            ],
            ["ljspeech", "avocodo"],
            ["ljspeech", "lbigvgan", "bigvgan"],
        ],
        "epochs": [10],
        "validation_interval": [10],
        "block_norm": [False],
        "batch_size": [128],
        "aug_contrast": [False],
        "model": ["modules"],
        "module": ["DCNN"],
        "kernel1": [3],
        "ochannels1": [64],
        "ochannels2": [64],
        "ochannels3": [96],
        "ochannels4": [128],
        "ochannels5": [32],
        "flattend_size": [320],
        "time_dim_add": [1],
        "hop_length": [220],
        "only_testing": [False],
        "only_ig": [False],
        "get_details": [False],
    }
