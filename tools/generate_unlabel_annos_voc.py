#!/usr/bin/env python
"""Detector results → per-image VOC pseudo-label bootstrap
(parity: ``/root/reference/tools/generate_unlabel_annos_voc.py``).

Accepts either a COCO-format results json + image list txt, or per-image
(dets, labels) dumps; writes the SemiVOC per-image JSON store.
"""

import argparse
import json
import os
import os.path as osp
from collections import defaultdict

from voc_convert2_semivoc_json import VOC_CLASSES  # noqa: E402


def report(det_file: str, image_list: str, out_dir: str, thres: float = 0.1):
    with open(det_file) as f:
        dets = json.load(f)
    with open(image_list) as f:
        names = [l.strip() for l in f if l.strip()]
    name_by_id = {i: n for i, n in enumerate(names)}
    by_img = defaultdict(lambda: dict(rects=[], tags=[], scores=[]))
    for d in dets:
        if d["score"] < thres:
            continue
        name = d.get("image_name") or name_by_id.get(d.get("image_id"))
        if name is None:
            continue
        x, y, w, h = d["bbox"]
        cid = int(d["category_id"])
        if not 0 <= cid < len(VOC_CLASSES):
            continue
        e = by_img[name]
        e["rects"].append([x, y, x + w, y + h])
        e["tags"].append(VOC_CLASSES[cid])
        e["scores"].append(float(d["score"]))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        e = by_img.get(name, dict(rects=[], tags=[], scores=[]))
        with open(osp.join(out_dir, name + ".json"), "w",
                  encoding="utf-8") as f:
            json.dump(dict(imageName="full/" + name,
                           targetNum=len(e["rects"]), rects=e["rects"],
                           tags=e["tags"], masks=[[] for _ in e["rects"]],
                           scores=e["scores"]), f, indent=4)
    print(f"wrote {len(names)} pseudo-label files to {out_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--det-file", required=True)
    p.add_argument("--image-list", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--thres", type=float, default=0.1)
    a = p.parse_args()
    report(a.det_file, a.image_list, a.out_dir, a.thres)
