#!/usr/bin/env bash
# Pseudo-label bootstrap (reference parity:
# tools/inference_unlabeled_coco_data.sh + generate_unlabel_annos_coco.py):
# run the detector on the unlabeled split, convert results to the per-image
# DSL annotation dir.
set -e
CONFIG=$1
CKPT=$2
UNLABELED_LIST=$3   # COCO json listing unlabeled images
CAT_INFO=$4         # mmdet_category_info.json
OUT_DIR=$5          # unlabel_prepared_annos/.../full
THRES=${6:-0.1}

python tools/test.py "$CONFIG" "$CKPT" --format-only --out /tmp/unlabeled.bbox.json \
  --cfg-options data.test.ann_file="$UNLABELED_LIST"
python tools/generate_unlabel_annos_coco.py --det-file /tmp/unlabeled.bbox.json \
  --cat-info "$CAT_INFO" --unlabeled-list "$UNLABELED_LIST" \
  --out-dir "$OUT_DIR" --thres "$THRES"
