#!/bin/bash
# ReviewNet XE training on a single encoder (reference train_review_net.sh).
set -e
set -o pipefail
ID=${ID:-review_net}
FEATURE=${FEATURE:-inception_v3}
mkdir -p log checkpoint
python main.py \
  --caption_model review_net --feature_type ${FEATURE} \
  --id ${ID} --seed ${SEED:-1} \
  --batch_size 10 --seq_per_img 5 \
  --optim adam --optim_lr 5e-4 \
  --learning_rate_decay_start 1 --learning_rate_decay_every 3 \
  --learning_rate_decay_rate 0.8 \
  --drop_prob_lm 0.3 --drop_prob_reason 0.3 \
  --save_checkpoint_every 5000 --val_images_use 5000 \
  --num_eval_no_improve 20 \
  "$@" 2>&1 | tee log/log_${ID}
