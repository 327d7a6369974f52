#!/usr/bin/env bash
# Dataset preparation wrapper — counterpart of the reference's
# scripts/ljspeech_prepare.sh SLURM job (which runs
# `python -m scripts.prepare_ljspeech`).  Host-only work: builds the frame
# index caches for train + the six cross-eval subsets.
#
# Usage: scripts/prepare_data.sh [ljspeech|asvspoof|inthewild] [extra args...]
set -euo pipefail

KIND="${1:-ljspeech}"
shift || true

echo "prepare start: $(date)"
python -m audiodeepfake_detection_tpu.data.prepare "${KIND}" "$@"
echo "prepare done: $(date)"
