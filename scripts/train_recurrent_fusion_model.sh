#!/bin/bash
# Multi-seed RFNet XE training fleet.
# Equivalent of the reference's train_recurrent_fusion_model.sh (one job per
# GPU via CUDA_VISIBLE_DEVICES, :7-30). On TPU the N seeds train vmapped in
# ONE program (--n_seeds): every seed's matmuls batch together on the MXU and
# per-seed best checkpoints land under ranks 0..N-1. Set FLEET_MODE=loop to
# fall back to one process per seed. Canonical hyperparameters from the
# reference script (:15-29).
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
  --optim adam --optim_lr 5e-4
  --learning_rate_decay_start 1 --learning_rate_decay_every 3
  --learning_rate_decay_rate 0.8
  --use_flip 1 --use_crop 1
  --use_label_smoothing 1 --label_smoothing_epsilon 0.1
  --drop_prob_lm 0.3 --drop_prob_reason 0.3 --drop_prob_fusion 0.3
  --save_checkpoint_every 5000 --val_images_use 5000
  --num_eval_no_improve 20
)

if [ "$FLEET_MODE" = "vmap" ]; then
  # FLEET_DEVICES=8 additionally shards the seed axis across an 8-device
  # mesh (fleet-over-mesh: one seed per chip of a v5e-8 slice)
  python main.py \
    --id ${ID} --seed 1 --n_seeds ${NUM_SEEDS} \
    --num_dp_devices ${FLEET_DEVICES:-1} \
    "${COMMON_ARGS[@]}" \
    "$@" 2>&1 | tee log/log_${ID}_fleet
else
  for ((SEED=1; SEED<=NUM_SEEDS; SEED++)); do
    python main.py \
      --id ${ID}_seed${SEED} --seed ${SEED} \
      "${COMMON_ARGS[@]}" \
      "$@" 2>&1 | tee log/log_${ID}_seed${SEED}
  done
fi
