"""Parity-run grid: reproduce the bundled reference checkpoints end-to-end.

Maps 1:1 to the bundled checkpoint filenames (reference ``models/model_*.pt``,
name scheme train_classifier.py:1221-1269), e.g.::

    model_stft_none_220_22050_22050_256_1-11025_0.7_0.0004_0.001_128_2_10e_
    DCNN_signsFalse_augcFalse_augnFalse_power2.0_fbmelgan_1secs_0.pt

Goal (BASELINE.md): with the real LJSpeech/WaveFake corpus under
``./data/fake`` (prepared by ``data/prepare.py``), a run of

    python -m audiodeepfake_detection_tpu.train.experiment \
        --enable-gs --config configs/parity_run.py --init-seeds 0 \
        --tensorboard --frame-cache

must reproduce each bundled checkpoint's test accuracy / EER within +-0.5%
and emit snapshots whose filenames match the bundled ones byte-for-byte.
The ``transform``/``wavelet`` axes cover all three bundled checkpoints
(stft, packets-sym5, packets-coif4) in one grid; trim the lists to run one.

When retraining over several seeds (``--init-seeds 0 1 2 3 4``), consider
``--vmap-seeds`` to train all seeds in one compiled program — but note
memory scales with the seed count (fp32 parity activations at batch 128
fit ~2 seeds on a 16 GB v5e chip; lower the batch size or use the bf16
speed mode for more).
"""


def get_config() -> dict:
    return {
        # the three bundled-checkpoint front-ends; the stft row ignores
        # the wavelet axis name-wise but keeps the grid rectangular, so
        # run packets and stft as separate invocations for exact filenames
        "transform": ["packets"],
        "wavelet": ["sym5", "coif4"],
        "features": ["none"],
        "hop_length": [220],
        "sample_rate": [22050],
        "window_size": [22050],
        "num_of_scales": [256],
        "f_min": [1.0],
        "f_max": [11025.0],
        "learning_rate": [0.0004],
        "weight_decay": [0.001],
        "batch_size": [128],
        "nclasses": [2],
        "epochs": [10],
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
        "loss_less": ["False"],
        "aug_contrast": [False],
        "aug_noise": [False],
        "power": [2.0],
        "log_scale": [True],
        "calc_normalization": [True],
        "seconds": [1],
        "dropout_cnn": [0.6],
        "dropout_lstm": [0.2],
        "validation_interval": [2],
        "ckpt_every": [2],
        # data layout exactly as the reference's prepare scripts emit it
        "data_path": ["./data/fake"],
        # the snapshot filename takes tokens 0 and 3 of this basename
        # (utils/naming.py); "model_..." reproduces the bundled names
        "data_prefix": ["./data/fake/model_22050_22050_0.7_fbmelgan"],
        "save_path": ["./data/parity_run"],
        "only_use": [["ljspeech", "fbmelgan"]],
        "limit_train": [(55504, 7504, 15504)],
        "cross_data_path": ["./data/fake"],
        "cross_limit": [(55500, 7304, 14600)],
        "cross_sources": [
            [
                "avocodo", "bigvgan", "bigvganl", "conformer", "hifigan",
                "melgan", "lmelgan", "mbmelgan", "pwg", "waveglow",
                "jsutmbmelgan", "jsutpwg",
            ]
        ],
        "only_test_folders": [["conformer", "jsutmbmelgan", "jsutpwg"]],
        "file_type": ["wav"],
        "log_dir": ["./exp/parity"],
    }
