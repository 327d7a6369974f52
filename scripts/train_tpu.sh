#!/usr/bin/env bash
# TPU launch script — the mesh-native counterpart of the reference's SLURM
# torchrun launcher (reference: scripts/train.sh).  On a single host the
# experiment driver uses every local chip through one jax Mesh; on a
# multi-host slice, launch this script once per host (e.g. with
# `gcloud compute tpus tpu-vm ssh --worker=all`) — jax.distributed picks up
# the slice topology from the TPU environment.
#
# Usage: scripts/train_tpu.sh <transform> <generator> <num_of_scales> \
#            <wavelet> <power> <loss_less> <flattend_size> <time_dim_add>
set -euo pipefail

TRANSFORM="${1:-packets}"
GENERATOR="${2:-fbmelgan}"
SCALES="${3:-256}"
WAVELET="${4:-sym5}"
POWER="${5:-2.0}"
LOSS_LESS="${6:-False}"
FLATTEND="${7:-320}"
TIME_DIM_ADD="${8:-1}"

echo "train start: $(date)"

python -m audiodeepfake_detection_tpu.train.experiment \
    --log-dir "${LOG_DIR:-./exp/log}" \
    --transform "${TRANSFORM}" \
    --wavelet "${WAVELET}" \
    --num-of-scales "${SCALES}" \
    --power "${POWER}" \
    --loss-less "${LOSS_LESS}" \
    --flattend-size "${FLATTEND}" \
    --time-dim-add "${TIME_DIM_ADD}" \
    --log-scale \
    --model modules \
    --batch-size 128 \
    --learning-rate 0.0004 \
    --weight-decay 0.001 \
    --epochs 10 \
    --enable-gs \
    --config "${GRID_CONFIG:-configs/gridsearch_config.py}"

echo "train end: $(date)"
