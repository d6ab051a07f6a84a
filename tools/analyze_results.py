#!/usr/bin/env python
"""Visualize best/worst predictions by per-image mAP
(reference parity: ``tools/analysis_tools/analyze_results.py``)."""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="COCO-format detections json")
    p.add_argument("--show-dir", default="analyze_out")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    from dsl_tpu.config import Config
    from dsl_tpu.apis.train import build_dataset
    from dsl_tpu.core.eval.coco_eval import COCOEval
    from dsl_tpu.core.visualization import imshow_gt_det_bboxes

    cfg = Config.fromfile(args.config)
    ds = build_dataset({**dict(cfg.data.get("test", cfg.data.get("val"))),
                        "test_mode": True})
    with open(args.results) as f:
        dets = json.load(f)
    cat_to_label = {cid: i for i, cid in enumerate(ds.cat_ids)}

    # per-image mAP
    scores = []
    for info in ds.data_infos:
        img_id = info["id"]
        ev = COCOEval(ds.coco, dets, img_ids=[img_id], cat_ids=ds.cat_ids)
        stats = ev.evaluate()
        scores.append((stats["mAP"], info))
    order = sorted(range(len(scores)), key=lambda i: scores[i][0])
    picks = ([("worst", i) for i in order[:args.topk]]
             + [("best", i) for i in order[-args.topk:]])

    os.makedirs(args.show_dir, exist_ok=True)
    by_img = {}
    for d in dets:
        by_img.setdefault(d["image_id"], []).append(d)
    for tag, i in picks:
        m, info = scores[i]
        img_path = osp.join(ds.img_prefix, info["filename"]) \
            if ds.img_prefix else info["filename"]
        anns = ds.coco.img_to_anns.get(info["id"], [])
        gt_boxes = np.asarray(
            [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2],
              a["bbox"][1] + a["bbox"][3]] for a in anns]).reshape(-1, 4)
        gt_labels = np.asarray(
            [cat_to_label.get(a["category_id"], 0) for a in anns], int)
        dd = by_img.get(info["id"], [])
        det_boxes = np.asarray(
            [[d["bbox"][0], d["bbox"][1], d["bbox"][0] + d["bbox"][2],
              d["bbox"][1] + d["bbox"][3], d["score"]]
             for d in dd]).reshape(-1, 5)
        det_labels = np.asarray(
            [cat_to_label.get(d["category_id"], 0) for d in dd], int)
        out = osp.join(args.show_dir,
                       f"{tag}_map{m:.3f}_{osp.basename(info['filename'])}")
        imshow_gt_det_bboxes(img_path, gt_boxes, gt_labels, det_boxes,
                             det_labels, class_names=ds.CLASSES,
                             score_thr=args.score_thr, out_file=out)
        print(out)


if __name__ == "__main__":
    main()
