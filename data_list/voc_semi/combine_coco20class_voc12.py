#!/usr/bin/env python
"""Build the VOC12 + COCO-20-class unlabeled set
(reference parity: data_list/voc_semi/combine_coco20class_voc12.py): select
COCO images containing only the 20 VOC classes, emit a combined image list.
"""

import argparse
import json
import os
import os.path as osp
import shutil

VOC_IN_COCO = {
    "airplane": "aeroplane", "bicycle": "bicycle", "bird": "bird",
    "boat": "boat", "bottle": "bottle", "bus": "bus", "car": "car",
    "cat": "cat", "chair": "chair", "cow": "cow",
    "dining table": "diningtable", "dog": "dog", "horse": "horse",
    "motorcycle": "motorbike", "person": "person",
    "potted plant": "pottedplant", "sheep": "sheep", "couch": "sofa",
    "train": "train", "tv": "tvmonitor"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coco-ann", required=True)
    p.add_argument("--coco-img-dir", required=True)
    p.add_argument("--voc12-list", required=True,
                   help="txt list of VOC12 trainval image files")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--copy-images", action="store_true")
    args = p.parse_args()

    with open(args.coco_ann) as f:
        coco = json.load(f)
    name_by_catid = {c["id"]: c["name"] for c in coco["categories"]}
    imgs_with_voc = set()
    imgs_with_other = set()
    for a in coco["annotations"]:
        nm = name_by_catid[a["category_id"]]
        (imgs_with_voc if nm in VOC_IN_COCO else imgs_with_other).add(
            a["image_id"])
    keep_ids = imgs_with_voc - imgs_with_other
    id_to_file = {i["id"]: i["file_name"] for i in coco["images"]}

    os.makedirs(args.out_dir, exist_ok=True)
    names = []
    with open(args.voc12_list) as f:
        names.extend(l.strip() for l in f if l.strip())
    coco_names = [id_to_file[i] for i in sorted(keep_ids)]
    names.extend(coco_names)
    with open(osp.join(args.out_dir, "voc12_coco20class_unlabel.txt"),
              "w") as f:
        f.write("\n".join(names) + "\n")
    if args.copy_images:
        for n in coco_names:
            src = osp.join(args.coco_img_dir, n)
            if osp.exists(src):
                shutil.copyfile(src, osp.join(args.out_dir, n))
    print(f"{len(names)} unlabeled images ({len(coco_names)} from COCO)")


if __name__ == "__main__":
    main()
