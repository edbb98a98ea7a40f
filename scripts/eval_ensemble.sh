#!/bin/bash
# Multi-checkpoint ensemble evaluation (reference eval_ensemble.sh); pass the
# seed ids via MODEL_IDS (comma separated).
set -e
set -o pipefail
python eval_ensemble.py \
  --model_path checkpoint \
  --model_ids ${MODEL_IDS:-rfnet_seed1,rfnet_seed2,rfnet_seed3,rfnet_seed4} \
  --rl_prefix ${RL:-1} \
  --eval_split ${SPLIT:-test} --beam_size ${BEAM:-3} --language_eval 1 \
  --eval_flip_ensemble ${FLIP:-0} \
  "$@"
