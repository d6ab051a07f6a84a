#!/usr/bin/env python
"""Detections json → per-image DSL pseudo-label annotations (bootstrap).

Parity with ``/root/reference/tools/generate_unlabel_annos_coco.py:21-91``:
take a detector's COCO-format ``*.bbox.json`` results on the unlabeled
split + ``mmdet_category_info.json``, threshold at ``--thres``, and write the
initial per-image pseudo-label JSONs the SemiCOCODataset reads.
"""

import argparse
import json
import os
import os.path as osp
from collections import defaultdict


def report(det_file: str, cat_info_file: str, unlabeled_list: str,
           out_dir: str, thres: float = 0.1):
    with open(cat_info_file, encoding="utf-8") as f:
        cat_info = json.load(f)
    id2cat = cat_info["id2cat"]
    with open(det_file) as f:
        dets = json.load(f)
    with open(unlabeled_list) as f:
        listing = json.load(f)
    imgs = {i["id"]: i.get("file_name", i.get("filename"))
            for i in listing["images"]}
    # COCO category ids in results are the dataset's cat_ids; map via the
    # listing's categories when present, else assume contiguous
    catid_to_contig = {}
    if listing.get("categories"):
        for i, c in enumerate(listing["categories"]):
            catid_to_contig[c["id"]] = i

    by_img = defaultdict(lambda: dict(rects=[], tags=[], scores=[]))
    for d in dets:
        if d["score"] < thres:
            continue
        name = imgs.get(d["image_id"])
        if name is None:
            continue
        x, y, w, h = d["bbox"]
        contig = catid_to_contig.get(d["category_id"], d["category_id"])
        tag = id2cat.get(str(contig))
        if tag is None:
            continue
        e = by_img[name]
        e["rects"].append([x, y, x + w, y + h])
        e["tags"].append(tag)
        e["scores"].append(float(d["score"]))

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for img_id, name in imgs.items():
        e = by_img.get(name, dict(rects=[], tags=[], scores=[]))
        data = dict(imageName="full/" + name, targetNum=len(e["rects"]),
                    rects=e["rects"], tags=e["tags"],
                    masks=[[] for _ in e["rects"]], scores=e["scores"])
        with open(osp.join(out_dir, name + ".json"), "w",
                  encoding="utf-8") as f:
            json.dump(data, f, indent=4, ensure_ascii=False)
        n += 1
    print(f"wrote {n} pseudo-label files to {out_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--det-file", required=True, help="*.bbox.json results")
    p.add_argument("--cat-info", required=True)
    p.add_argument("--unlabeled-list", required=True,
                   help="COCO json listing the unlabeled images")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--thres", type=float, default=0.1)
    a = p.parse_args()
    report(a.det_file, a.cat_info, a.unlabeled_list, a.out_dir, a.thres)
