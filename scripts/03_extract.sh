#!/usr/bin/env bash
# W4 prep: export celeb_basis.pt + per-identity TI-compatible embeddings
set -euo pipefail
EMBEDDING=${1:?usage: 03_extract.sh <embeddings_gs-*.pt> [outdir]}
OUTDIR=${2:-weights/ti_id_embeddings}
python -m celebbasis_tpu.cli.extract \
  --config configs/aigc_id.yaml --embedding_path "$EMBEDDING" --outdir "$OUTDIR"
