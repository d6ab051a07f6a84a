#!/usr/bin/env python
"""COCO → DSL-style data dir converter.

Behavior parity with the reference tool of the same name
(``/root/reference/tools/coco_convert2_semicoco_json.py:6-114``): builds
``images/full``, ``valid_images/full``, ``unlabel_images/full``,
``prepared_annos/Industry/annotations/full/*.json`` (one JSON per image with
``imageName/targetNum/rects/tags/masks``) and ``mmdet_category_info.json``
(``cat2id``/``id2cat`` with an extra background class).

Fresh implementation: single pass over annotations in memory instead of the
reference's per-annotation file rewrite loop (O(A) reads+writes → O(I) writes).
"""

import argparse
import json
import os
import os.path as osp
import shutil
from collections import defaultdict

BACKGROUND = "background"


def _per_image_annos(coco: dict, id_to_name: dict) -> dict:
    by_img = defaultdict(lambda: dict(rects=[], tags=[]))
    for ann in coco.get("annotations", []):
        x, y, w, h = ann["bbox"]
        e = by_img[ann["image_id"]]
        e["rects"].append([x, y, x + w, y + h])
        e["tags"].append(id_to_name[ann["category_id"]])
    return by_img


def _write_split(coco: dict, out_dir: str, list_file: str):
    os.makedirs(out_dir, exist_ok=True)
    id_to_name = {c["id"]: c["name"] for c in coco["categories"]}
    by_img = _per_image_annos(coco, id_to_name)
    names = []
    for img in coco["images"]:
        name = img["file_name"]
        names.append(name)
        e = by_img.get(img["id"], dict(rects=[], tags=[]))
        data = dict(imageName="full/" + name, targetNum=len(e["rects"]),
                    rects=e["rects"], tags=e["tags"],
                    masks=[[] for _ in e["rects"]])
        with open(osp.join(out_dir, name + ".json"), "w",
                  encoding="utf-8") as f:
            json.dump(data, f, indent=4, ensure_ascii=False)
    if list_file:
        os.makedirs(osp.dirname(list_file), exist_ok=True)
        with open(list_file, "w") as f:
            f.write("\n".join(names) + "\n")
    return names


def convert(coco_root: str, out_root: str, copy_images: bool = True):
    anno_dir = osp.join(out_root, "prepared_annos/Industry/annotations/full")
    os.makedirs(anno_dir, exist_ok=True)
    os.makedirs(osp.join(out_root,
                         "unlabel_prepared_annos/Industry/annotations/full"),
                exist_ok=True)
    for d in ("images/full", "valid_images/full", "unlabel_images/full"):
        os.makedirs(osp.join(out_root, d), exist_ok=True)

    with open(osp.join(coco_root, "annotations",
                       "instances_train2017.json")) as f:
        train = json.load(f)
    with open(osp.join(coco_root, "annotations",
                       "instances_val2017.json")) as f:
        val = json.load(f)

    # category info with background class
    cat2id, id2cat = {}, {}
    for i, c in enumerate(val["categories"]):
        cat2id[c["name"]] = i
        id2cat[str(i)] = c["name"]
    cat2id[BACKGROUND] = len(val["categories"])
    id2cat[str(len(val["categories"]))] = BACKGROUND
    with open(osp.join(out_root, "mmdet_category_info.json"), "w",
              encoding="utf-8") as f:
        json.dump(dict(cat2id=cat2id, id2cat=id2cat), f, indent=4,
                  ensure_ascii=False)

    _write_split(train, anno_dir,
                 osp.join(out_root, "prepared_annos/Industry/train_list.txt"))
    _write_split(val, anno_dir,
                 osp.join(out_root, "prepared_annos/Industry/valid_list.txt"))

    if copy_images:
        for split, dst in (("train2017", "images/full"),
                           ("val2017", "valid_images/full")):
            src_dir = osp.join(coco_root, split)
            if not osp.isdir(src_dir):
                continue
            for name in os.listdir(src_dir):
                dst_path = osp.join(out_root, dst, name)
                if not osp.exists(dst_path):
                    shutil.copyfile(osp.join(src_dir, name), dst_path)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="coco dir")
    p.add_argument("--output", required=True, help="semicoco out dir")
    p.add_argument("--no-copy-images", action="store_true")
    a = p.parse_args()
    convert(a.input, a.output, copy_images=not a.no_copy_images)
