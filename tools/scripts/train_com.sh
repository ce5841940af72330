#!/usr/bin/env bash
# Pinned full-COM training run (role of the reference's dist_train_com.sh).
set -euo pipefail
python tools/train.py \
  --cfg_file configs/waymo_models/com/centerpoint_pillar_3cls_com.yaml \
  --fix_random_seed "$@"
