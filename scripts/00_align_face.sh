#!/usr/bin/env bash
# W0: folder of photos -> aligned 512x512 FFHQ crops + ffhq.pickle
# (reference 00_align_face.sh; the native NMS library builds itself on first use)
set -euo pipefail
IN_FOLDER=${1:?usage: 00_align_face.sh <in_folder> <out_folder> [weights_dir]}
OUT_FOLDER=${2:?}
WEIGHTS=${3:-./weights}
python -m celebbasis_tpu.cli.align \
  --in_folder "$IN_FOLDER" --out_folder "$OUT_FOLDER" --crop_size 512 --mode ffhq \
  ${WEIGHTS:+--detector_ckpt "$WEIGHTS/FaceBoxesV2.pth"} \
  ${WEIGHTS:+--pipnet_ckpt "$WEIGHTS/epoch59.pth"} \
  ${WEIGHTS:+--meanface "$WEIGHTS/meanface.txt"}
