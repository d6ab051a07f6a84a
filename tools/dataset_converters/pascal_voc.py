"""Convert PASCAL VOC XML annotations to COCO json.

Parity with ``/root/reference/tools/dataset_converters/pascal_voc.py``:
walks ``VOC{year}/ImageSets/Main/{split}.txt``, parses each Annotations
XML, and emits a COCO-format json (difficult boxes become ``ignore=1`` /
``iscrowd=1`` annotations, matching ``addAnnItem`` :105-140).

Usage:
  python tools/dataset_converters/pascal_voc.py <devkit_path> \
      --years 2007 2012 --split trainval --out voc_trainval.json
"""

import argparse
import json
import os.path as osp
import xml.etree.ElementTree as ET

VOC_CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
               "motorbike", "person", "pottedplant", "sheep", "sofa",
               "train", "tvmonitor")


def parse_xml(xml_path, img_path):
    tree = ET.parse(xml_path)
    root = tree.getroot()
    size = root.find("size")
    w = int(size.find("width").text)
    h = int(size.find("height").text)
    objs = []
    for obj in root.findall("object"):
        name = obj.find("name").text
        if name not in VOC_CLASSES:
            continue
        label = VOC_CLASSES.index(name)
        difficult = int(obj.find("difficult").text) \
            if obj.find("difficult") is not None else 0
        bnd = obj.find("bndbox")
        # VOC is 1-indexed inclusive; -1 matches the reference parser
        bbox = [int(float(bnd.find("xmin").text)) - 1,
                int(float(bnd.find("ymin").text)) - 1,
                int(float(bnd.find("xmax").text)),
                int(float(bnd.find("ymax").text))]
        objs.append(dict(label=label, bbox=bbox, difficult=difficult))
    return dict(filename=img_path, width=w, height=h, objects=objs)


def cvt_to_coco_json(annotations):
    images, anns, ann_id = [], [], 1
    for img_id, a in enumerate(annotations):
        images.append(dict(id=img_id, file_name=a["filename"],
                           width=a["width"], height=a["height"]))
        for o in a["objects"]:
            x1, y1, x2, y2 = o["bbox"]
            bw, bh = x2 - x1, y2 - y1
            anns.append(dict(
                id=ann_id, image_id=img_id, category_id=o["label"] + 1,
                bbox=[x1, y1, bw, bh], area=bw * bh,
                iscrowd=int(o["difficult"]), ignore=int(o["difficult"]),
                segmentation=[[x1, y1, x1, y2, x2, y2, x2, y1]]))
            ann_id += 1
    cats = [dict(id=i + 1, name=n) for i, n in enumerate(VOC_CLASSES)]
    return dict(images=images, annotations=anns, categories=cats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("devkit_path")
    p.add_argument("--years", nargs="+", default=["2007", "2012"])
    p.add_argument("--split", default="trainval")
    p.add_argument("--out", default="voc_coco.json")
    args = p.parse_args()

    annotations = []
    for year in args.years:
        list_file = osp.join(args.devkit_path, f"VOC{year}", "ImageSets",
                             "Main", f"{args.split}.txt")
        if not osp.exists(list_file):
            continue
        with open(list_file) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        for name in names:
            xml_path = osp.join(args.devkit_path, f"VOC{year}",
                                "Annotations", f"{name}.xml")
            img_path = f"VOC{year}/JPEGImages/{name}.jpg"
            annotations.append(parse_xml(xml_path, img_path))
    coco = cvt_to_coco_json(annotations)
    with open(args.out, "w") as f:
        json.dump(coco, f)
    print(f"wrote {args.out}: {len(coco['images'])} images, "
          f"{len(coco['annotations'])} annotations")


if __name__ == "__main__":
    main()
