#!/usr/bin/env bash
# Supervised FCOS baseline on the x%-labeled COCO split
# (reference parity: demo/model_train/baseline_coco.sh — torch.distributed
# ranks are replaced by the single-process TPU mesh).
set -e
CONFIG=${1:-configs/fcos_semi/r50_caffe_mslonger_tricks_0.Xdata.py}
WORK_DIR=${2:-work_dirs/baseline_coco}
python tools/train.py "$CONFIG" --work-dir "$WORK_DIR"
