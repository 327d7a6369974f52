"""Wavelet-family sweep grid (counterpart of the reference's
scripts/start_exps.sh, which loops train.sh over db2-10/sym2-10/coif2-10).

Here the sweep is a single grid axis — the driver runs the cartesian
product (seeds x wavelets x cross_sources) in one process, reusing compiled
steps across seeds.
"""


def get_config() -> dict:
    return {
        "transform": ["packets"],
        "wavelet": (
            [f"db{i}" for i in range(2, 11)]
            + [f"sym{i}" for i in range(2, 11)]
            + [f"coif{i}" for i in range(2, 11)]
        ),
        "log_scale": [True],
        "learning_rate": [0.0004],
        "weight_decay": [0.001],
        "save_path": ["./data/run1"],
        "data_path": ["./data/fake"],
        "only_use": [["ljspeech", "fbmelgan"]],
        "limit_train": [(55504, 7504, 15504)],
        "cross_data_path": ["./data/fake"],
        "cross_limit": [(55500, 7304, 14600)],
        "only_test_folders": [["conformer", "jsutmbmelgan", "jsutpwg"]],
        "file_type": ["wav"],
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
            ]
        ],
        "epochs": [10],
        "validation_interval": [10],
        "batch_size": [128],
        "model": ["modules"],
        "module": ["DCNN"],
        "kernel1": [3],
        "flattend_size": [320],
        "time_dim_add": [1],
        "hop_length": [220],
    }
