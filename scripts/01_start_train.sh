#!/usr/bin/env bash
# W2: single-identity personalization (800 steps, bs 2, lr 1e-2)
set -euo pipefail
EXP_NAME=${1:?usage: 01_start_train.sh <exp_name> <data_root> [sd_ckpt] [fr_ckpt]}
DATA_ROOT=${2:?}
SD_CKPT=${3:-}
FR_CKPT=${4:-}
python -m celebbasis_tpu.cli.train \
  --base configs/aigc_id.yaml --name "$EXP_NAME" --data_root "$DATA_ROOT" \
  ${SD_CKPT:+--actual_resume "$SD_CKPT"} ${FR_CKPT:+--fr_ckpt "$FR_CKPT"}
