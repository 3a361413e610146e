#!/usr/bin/env bash
# W3: two-pseudo-word sampling (DDIM 50, scale 10, 512^2, seed 42)
set -euo pipefail
EMBEDDING=${1:?usage: 02_start_test.sh <embeddings_gs-*.pt> <prompt_file> [sd_ckpt] [outdir]}
PROMPTS=${2:?}
SD_CKPT=${3:-}
OUTDIR=${4:-outputs/txt2img-samples}
python -m celebbasis_tpu.cli.txt2img \
  --config configs/aigc_id.yaml --embedding_path "$EMBEDDING" \
  --from-file "$PROMPTS" --outdir "$OUTDIR" \
  --ddim_steps 50 --scale 10.0 --n_samples 8 --H 512 --W 512 --seed 42 \
  ${SD_CKPT:+--ckpt "$SD_CKPT"}
