#!/usr/bin/env bash
# Supervised baseline on VOC (reference parity: demo/model_train/baseline_voc.sh)
set -e
CONFIG=${1:-configs/fcos_semi/voc/RLA_r50_fcos_semi_voc.py}
WORK_DIR=${2:-work_dirs/baseline_voc}
python tools/train.py "$CONFIG" --work-dir "$WORK_DIR"
