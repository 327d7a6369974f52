#!/usr/bin/env bash
# Sweep launcher (counterpart of reference scripts/start_exps.sh): runs the
# wavelet-family grid in one driver process.
set -euo pipefail
GRID_CONFIG=configs/wavelet_sweep_config.py exec scripts/train_tpu.sh packets fbmelgan 256 sym5 2.0 False 320 1
