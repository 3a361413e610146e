#!/usr/bin/env bash
# Vanilla textual-inversion baseline training (reference textual_train.sh / main.py)
set -euo pipefail
DATA_ROOT=${1:?usage: textual_train.sh <data_root> <init_word> [sd_ckpt]}
INIT_WORD=${2:?}
SD_CKPT=${3:-}
python -m celebbasis_tpu.cli.train_ti \
  --base configs/aigc_id.yaml --data_root "$DATA_ROOT" \
  --placeholder '*' --init_word "$INIT_WORD" --coarse_class person \
  ${SD_CKPT:+--actual_resume "$SD_CKPT"}
