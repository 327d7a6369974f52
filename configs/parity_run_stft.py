"""STFT half of the parity-run grid (see configs/parity_run.py).

Reproduces the bundled ``model_stft_none_220_22050_22050_256_1-11025_0.7_
0.0004_0.001_128_2_10e_DCNN_...`` checkpoint (reference models/, name
scheme train_classifier.py:1221-1269).  Kept as a separate file because
the snapshot filename takes its transform token from the config, and a
rectangular grid with both ``packets`` and ``stft`` rows would name the
stft run with a wavelet token it does not use.

    python -m audiodeepfake_detection_tpu.train.experiment \
        --enable-gs --config configs/parity_run_stft.py --init-seeds 0 \
        --tensorboard --frame-cache
"""

import importlib.util
import os


def _packets_config() -> dict:
    # configs are loaded by file path (utils/config.py load_grid_config),
    # not as a package, so resolve the sibling the same way
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "parity_run.py")
    spec = importlib.util.spec_from_file_location("parity_run_base", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)  # type: ignore[union-attr]
    return module.get_config()


def get_config() -> dict:
    cfg = _packets_config()
    cfg["transform"] = ["stft"]
    del cfg["wavelet"]  # stft ignores it; keep the name scheme clean
    return cfg
