#!/usr/bin/env bash
# Sample with a (merged) textual-inversion checkpoint (reference textual_test.sh)
set -euo pipefail
TI_CKPT=${1:?usage: textual_test.sh <ti_embeddings.pt> <prompt_file> [sd_ckpt]}
PROMPTS=${2:?}
SD_CKPT=${3:-}
python -m celebbasis_tpu.cli.txt2img \
  --config configs/aigc_id.yaml --ti_embedding "$TI_CKPT" \
  --from-file "$PROMPTS" --ddim_steps 50 --scale 10.0 --n_samples 8 \
  ${SD_CKPT:+--ckpt "$SD_CKPT"}
