#!/usr/bin/env python
"""Detection error breakdown.

Parity with ``/root/reference/tools/analysis_tools/coco_error_analysis.py``:
decompose the AP gap into localization / classification / background /
missed-GT error by re-scoring under relaxed matching regimes.
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="COCO-format detections json")
    args = p.parse_args()

    from dsl_tpu.config import Config
    from dsl_tpu.apis.train import build_dataset
    from dsl_tpu.core.eval.coco_eval import COCOEval, IOU_THRS
    from dsl_tpu.data.coco_api import COCO

    cfg = Config.fromfile(args.config)
    ds = build_dataset({**dict(cfg.data.get("test", cfg.data.get("val"))),
                        "test_mode": True})
    with open(args.results) as f:
        dets = json.load(f)
    img_ids = [d["id"] for d in ds.data_infos]

    def run(gt, dts, **kw):
        ev = COCOEval(gt, dts, img_ids=img_ids, cat_ids=ds.cat_ids, **kw)
        return ev.evaluate()

    base = run(ds.coco, dets)
    # AP at IoU .1 — localization-tolerant
    loose = run(ds.coco, dets, iou_thrs=[0.1])
    # class-agnostic: collapse all categories to one
    gt_agnostic = COCO(dataset=dict(
        images=ds.coco.dataset.get("images", []),
        categories=[dict(id=0, name="obj")],
        annotations=[{**a, "category_id": 0}
                     for a in ds.coco.dataset.get("annotations", [])]))
    dets_agnostic = [{**d, "category_id": 0} for d in dets]
    agnostic = COCOEval(gt_agnostic, dets_agnostic, img_ids=img_ids,
                        cat_ids=[0], iou_thrs=[0.1]).evaluate()

    # the loose/agnostic ladders are single-threshold ([0.1]), so their
    # overall mAP IS the AP10
    print(f"AP@[.5:.95]          : {base['mAP']:.4f}")
    print(f"AP50                 : {base['mAP_50']:.4f}")
    print(f"AP10 (loc-tolerant)  : {loose['mAP']:.4f}")
    print(f"AP10 class-agnostic  : {agnostic['mAP']:.4f}")
    print("error attribution:")
    print(f"  localization : {max(loose['mAP'] - base['mAP_50'], 0):.4f}")
    print(f"  classification: "
          f"{max(agnostic['mAP'] - loose['mAP'], 0):.4f}")
    print(f"  bg/missed    : {max(1.0 - agnostic['mAP'], 0):.4f}")


if __name__ == "__main__":
    main()
