#!/bin/bash
# Single-model beam-search evaluation (reference eval_single.sh).
set -e
set -o pipefail
python eval.py \
  --model_path checkpoint --load_model_id ${ID:-rfnet_seed1} \
  --eval_split ${SPLIT:-test} --beam_size ${BEAM:-3} --language_eval 1 \
  "$@"
