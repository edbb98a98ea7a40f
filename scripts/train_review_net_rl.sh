#!/bin/bash
# ReviewNet SCST fine-tune (reference train_review_net_rl.sh).
set -e
set -o pipefail
ID=${ID:-review_net}
FEATURE=${FEATURE:-inception_v3}
mkdir -p log checkpoint
python main_rl.py \
  --caption_model review_net --feature_type ${FEATURE} \
  --id ${ID} --seed ${SEED:-1} \
  --start_from checkpoint --load_model_id ${ID} --load_lr 1 \
  --batch_size 10 --seq_per_img 5 \
  --optim adam --optim_rl_lr 5e-5 \
  --cider_weight 1.0 --entropy_reg 0.01 \
  --save_checkpoint_every 5000 --val_images_use 5000 \
  "$@" 2>&1 | tee log/log_rl_${ID}
