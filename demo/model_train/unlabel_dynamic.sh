#!/usr/bin/env bash
# Full DSL teacher-student training with dynamic pseudo-label refresh
# (reference parity: demo/model_train/unlabel_dynamic.sh:1-17 — steps:
#  1. copy the bootstrap pseudo-labels into the unlabel anno dir
#  2. remove any stale adathres.json
#  3. launch semi training)
set -e
CONFIG=${1:-configs/fcos_semi/RLA_r50_fcos_semi_dsl.py}
WORK_DIR=${2:-work_dirs/unlabel_dynamic}
BOOTSTRAP_DIR=${3:-}   # optional: dir of initial pseudo-label JSONs to copy in

if [ -n "$BOOTSTRAP_DIR" ]; then
  DEST=$(python -c "from dsl_tpu.config import Config; print(Config.fromfile('$CONFIG').data['unlabel_pred']['anno_root_path'])")
  mkdir -p "$DEST"
  cp -r "$BOOTSTRAP_DIR"/. "$DEST"/
fi
rm -f adathres.json
python tools/train.py "$CONFIG" --work-dir "$WORK_DIR"
