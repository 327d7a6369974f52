#!/usr/bin/env bash
# Single-chip training — counterpart of the reference's
# scripts/train_singlegpu.sh (LCNN on one GPU, no DDP).  On TPU the same
# driver runs on however many local chips exist; restrict to one with
# JAX_PLATFORMS device visibility if needed.
#
# Usage: scripts/train_singlechip.sh <transform> <generator> <num_of_scales> \
#            <wavelet> <power> <loss_less> <flattend_size> <time_dim_add>
set -euo pipefail

TRANSFORM="${1:-stft}"
GENERATOR="${2:-fbmelgan}"
SCALES="${3:-256}"
WAVELET="${4:-sym8}"
POWER="${5:-2.0}"
LOSS_LESS="${6:-False}"
FLATTEND="${7:-9600}"
TIME_DIM_ADD="${8:-0}"

python -m audiodeepfake_detection_tpu.train.experiment \
    --log-dir "${LOG_DIR:-./exp/log}" \
    --data-prefix "./data/run1/fake_22050_22050_0.7_${GENERATOR}" \
    --nclasses 2 \
    --seed 0 \
    --model lcnn \
    --transform "${TRANSFORM}" \
    --num-of-scales "${SCALES}" \
    --wavelet "${WAVELET}" \
    --power "${POWER}" \
    --loss-less "${LOSS_LESS}" \
    --flattend-size "${FLATTEND}" \
    --time-dim-add "${TIME_DIM_ADD}" \
    --hop-length 100 \
    --log-scale \
    --f-min 1 \
    --f-max 11025 \
    --window-size 22050 \
    --sample-rate 22050 \
    --features none \
    --enable-gs \
    --calc-normalization \
    --pbar \
    --config "${GRID_CONFIG:-configs/gridsearch_config.py}"
