#!/usr/bin/env python
"""Re-evaluate saved detection results against a dataset
(reference parity: tools/analysis_tools/eval_metric.py)."""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from dsl_tpu.config import Config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="COCO-format detections json")
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    from dsl_tpu.apis.train import build_dataset

    ds = build_dataset({**dict(cfg.data.get("test", cfg.data.get("val"))),
                        "test_mode": True})
    with open(args.results) as f:
        dets = json.load(f)
    from dsl_tpu.core.eval.coco_eval import COCOEval

    ev = COCOEval(ds.coco, dets, img_ids=[d["id"] for d in ds.data_infos],
                  cat_ids=ds.cat_ids)
    ev.evaluate()
    ev.summarize()


if __name__ == "__main__":
    main()
