#!/bin/bash
# Multi-seed RFNet SCST fine-tune, warm-started from each seed's XE best
# checkpoint (reference train_recurrent_fusion_model_rl.sh:16-36). On TPU
# the N seeds fine-tune vmapped in ONE program (--n_seeds): per-seed rollouts
# batch on the MXU, rewards are scored per seed on the host, and seed r warm
# starts from the rank-r XE best checkpoint. Set FLEET_MODE=loop to fall back
# to one process per seed.
set -e
set -o pipefail
ID=${ID:-rfnet}
NUM_SEEDS=${NUM_SEEDS:-8}
FLEET_MODE=${FLEET_MODE:-vmap}
mkdir -p log checkpoint

# PARITY=1 pins the strict reference architecture (untied attention
# keys); default is the TPU-native profile (tied keys, ~1.5x faster,
# PERF_NOTES.md 4d)
COMMON_ARGS=(
  --reference_parity ${PARITY:-0}
  --caption_model recurrent_fusion_model --feature_type feat_array
  --batch_size 10 --seq_per_img 5
  --optim adam --optim_rl_lr 5e-5 --optim_rl_lr_ratio 2.0
  --cider_weight 1.0 --entropy_reg 0.01
  --save_checkpoint_every 5000 --val_images_use 5000
  --num_eval_no_improve 20
)

if [ "$FLEET_MODE" = "vmap" ]; then
  # FLEET_DEVICES=8: fleet-over-mesh (seed axis sharded, one seed per chip)
  python main_rl.py \
    --id ${ID} --seed 1 --n_seeds ${NUM_SEEDS} \
    --num_dp_devices ${FLEET_DEVICES:-1} \
    --start_from checkpoint --load_model_id ${ID} --load_lr 1 \
    "${COMMON_ARGS[@]}" \
    "$@" 2>&1 | tee log/log_rl_${ID}_fleet
else
  for ((SEED=1; SEED<=NUM_SEEDS; SEED++)); do
    python main_rl.py \
      --id ${ID}_seed${SEED} --seed ${SEED} \
      --start_from checkpoint --load_model_id ${ID}_seed${SEED} --load_lr 1 \
      "${COMMON_ARGS[@]}" \
      "$@" 2>&1 | tee log/log_rl_${ID}_seed${SEED}
  done
fi
