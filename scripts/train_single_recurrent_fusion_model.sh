#!/bin/bash
# Single-seed RFNet XE training (reference train_single_recurrent_fusion_model.sh).
set -e
set -o pipefail
NUM_SEEDS=1 ID=${ID:-rfnet_single} exec bash "$(dirname "$0")/train_recurrent_fusion_model.sh" "$@"
