#!/usr/bin/env python
"""Visualize pipeline outputs (reference parity: tools/misc/browse_dataset.py)."""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import cv2

from dsl_tpu.config import Config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--output-dir", default="browse_out")
    p.add_argument("--number", type=int, default=10)
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    from dsl_tpu.apis.train import build_dataset

    ds = build_dataset(dict(cfg.data.train))
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(min(args.number, len(ds))):
        sample = ds[i]
        img = sample["img"]
        # un-normalize for display
        norm = sample.get("img_norm_cfg")
        if norm is not None:
            img = img * norm["std"] + norm["mean"]
            if norm["to_rgb"]:
                img = img[..., ::-1]
        img = np.clip(img, 0, 255).astype(np.uint8).copy()
        for x1, y1, x2, y2 in sample.get("gt_bboxes", []):
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 255, 0), 2)
        for x1, y1, x2, y2 in sample.get("gt_bboxes_ignore", []):
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 160, 255), 1)
        out = osp.join(args.output_dir, f"sample_{i}.jpg")
        cv2.imwrite(out, img)
        print(out)


if __name__ == "__main__":
    main()
