#!/usr/bin/env python
"""VOC XML → DSL per-image JSON converter.

Parity with ``/root/reference/tools/voc_convert2_semivoc_json.py`` (157 LoC):
walk a VOC dir, copy/list images, and write one
``{name}.json`` (``imageName/targetNum/rects/tags/masks``) per image plus
``mmdet_category_info.json`` for the 20 VOC classes (+background).
"""

import argparse
import json
import os
import os.path as osp
import shutil
import xml.etree.ElementTree as ET

VOC_CLASSES = (
    'aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus', 'car', 'cat',
    'chair', 'cow', 'diningtable', 'dog', 'horse', 'motorbike', 'person',
    'pottedplant', 'sheep', 'sofa', 'train', 'tvmonitor')


def parse_xml(xml_path: str):
    root = ET.parse(xml_path).getroot()
    rects, tags = [], []
    for obj in root.findall("object"):
        name = obj.find("name").text
        if name not in VOC_CLASSES:
            continue
        bnd = obj.find("bndbox")
        rects.append([float(bnd.find(t).text)
                      for t in ("xmin", "ymin", "xmax", "ymax")])
        tags.append(name)
    return rects, tags


def convert(voc_root: str, split_file: str, out_root: str,
            copy_images: bool = True):
    anno_dir = osp.join(out_root, "prepared_annos/Industry/annotations/full")
    img_dir = osp.join(out_root, "images/full")
    os.makedirs(anno_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    cat2id = {c: i for i, c in enumerate(VOC_CLASSES)}
    cat2id["background"] = len(VOC_CLASSES)
    id2cat = {str(i): c for c, i in cat2id.items()}
    with open(osp.join(out_root, "mmdet_category_info.json"), "w",
              encoding="utf-8") as f:
        json.dump(dict(cat2id=cat2id, id2cat=id2cat), f, indent=4)

    with open(split_file) as f:
        ids = [l.strip().split()[0] for l in f if l.strip()]
    names = []
    for img_id in ids:
        name = f"{img_id}.jpg"
        names.append(name)
        rects, tags = [], []
        xml_path = osp.join(voc_root, "Annotations", f"{img_id}.xml")
        if osp.exists(xml_path):
            rects, tags = parse_xml(xml_path)
        with open(osp.join(anno_dir, name + ".json"), "w",
                  encoding="utf-8") as f:
            json.dump(dict(imageName="full/" + name, targetNum=len(rects),
                           rects=rects, tags=tags,
                           masks=[[] for _ in rects]), f, indent=4)
        if copy_images:
            src = osp.join(voc_root, "JPEGImages", name)
            dst = osp.join(img_dir, name)
            if osp.exists(src) and not osp.exists(dst):
                shutil.copyfile(src, dst)
    with open(osp.join(out_root, "prepared_annos/Industry/train_list.txt"),
              "w") as f:
        f.write("\n".join(names) + "\n")
    print(f"converted {len(names)} images")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--voc-root", required=True, help="VOCdevkit/VOC2007 dir")
    p.add_argument("--split", required=True,
                   help="ImageSets/Main/trainval.txt")
    p.add_argument("--output", required=True)
    p.add_argument("--no-copy-images", action="store_true")
    a = p.parse_args()
    convert(a.voc_root, a.split, a.output, not a.no_copy_images)
