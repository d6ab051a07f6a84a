#!/usr/bin/env python
"""Generate the x%-labeled STAC-protocol split lists.

Parity with ``/root/reference/data_list/coco_semi/prepare_dta.py:30-116``:
from ``instances_train2017.json`` produce
``instances_train2017.{seed}@{percent}.json`` (labeled subset) and
``...-unlabeled.json`` (complement), deterministic per seed.
"""

import argparse
import json
import os
import os.path as osp

import numpy as np


def prepare_coco_data(ann_file: str, out_dir: str, percent: float,
                      seed: int, suffix: str = ""):
    with open(ann_file) as f:
        coco = json.load(f)
    img_ids = [i["id"] for i in coco["images"]]
    rng = np.random.RandomState(seed)
    n_label = int(round(len(img_ids) * percent / 100.0))
    perm = rng.permutation(len(img_ids))
    labeled = {img_ids[i] for i in perm[:n_label]}

    def subset(keep_labeled: bool):
        keep = (lambda i: i in labeled) if keep_labeled else \
            (lambda i: i not in labeled)
        images = [im for im in coco["images"] if keep(im["id"])]
        ids = {im["id"] for im in images}
        anns = [a for a in coco["annotations"] if a["image_id"] in ids] \
            if keep_labeled else []
        return dict(images=images, annotations=anns,
                    categories=coco["categories"],
                    info=coco.get("info", {}),
                    licenses=coco.get("licenses", []))

    os.makedirs(out_dir, exist_ok=True)
    base = osp.splitext(osp.basename(ann_file))[0]
    lab_path = osp.join(out_dir, f"{base}.{seed}@{percent:g}{suffix}.json")
    unl_path = osp.join(out_dir,
                        f"{base}.{seed}@{percent:g}{suffix}-unlabeled.json")
    with open(lab_path, "w") as f:
        json.dump(subset(True), f)
    with open(unl_path, "w") as f:
        json.dump(subset(False), f)
    print(f"labeled: {n_label} images -> {lab_path}")
    print(f"unlabeled: {len(img_ids) - n_label} images -> {unl_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--percent", type=float, default=10)
    p.add_argument("--seed", type=int, default=2)
    a = p.parse_args()
    prepare_coco_data(a.ann_file, a.out_dir, a.percent, a.seed)
