"""VOC ground truth evaluated under the COCO protocol.

Parity with ``/root/reference/mmdet/datasets/voc2coco.py:19-562``: parse VOC
XML annotations into a COCO-style index so VOC results can be scored with
COCO bbox mAP@[.5:.95] in addition to the VOC AP50 protocol.
"""

from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET

from dsl_tpu.data.coco_api import COCO
from dsl_tpu.data.datasets.coco import CocoDataset
from dsl_tpu.data.datasets.voc import VOC_CLASSES
from dsl_tpu.registry import DATASETS


@DATASETS.register(name="Voc2CocoDataset")
class Voc2CocoDataset(CocoDataset):
    CLASSES = VOC_CLASSES

    def __init__(self, ann_file, pipeline, img_subdir="JPEGImages",
                 ann_subdir="Annotations", **kwargs):
        self.img_subdir = img_subdir
        self.ann_subdir = ann_subdir
        super().__init__(ann_file=ann_file, pipeline=pipeline, **kwargs)

    def load_annotations(self, ann_file):
        """``ann_file``: txt list of VOC image ids; XMLs are converted into
        an in-memory COCO index."""
        with open(ann_file) as f:
            ids = [l.strip() for l in f if l.strip()]
        images, annotations = [], []
        ann_id = 1
        cat2id = {c: i for i, c in enumerate(self.CLASSES)}
        for img_idx, img_id in enumerate(ids):
            xml_path = osp.join(self.img_prefix, self.ann_subdir,
                                f"{img_id}.xml")
            width = height = 0
            objs = []
            if osp.exists(xml_path):
                root = ET.parse(xml_path).getroot()
                size = root.find("size")
                if size is not None:
                    width = int(size.find("width").text)
                    height = int(size.find("height").text)
                objs = root.findall("object")
            images.append(dict(
                id=img_idx + 1,
                file_name=osp.join(self.img_subdir, f"{img_id}.jpg"),
                width=width, height=height))
            for obj in objs:
                name = obj.find("name").text
                if name not in cat2id:
                    continue
                difficult = obj.find("difficult")
                difficult = int(difficult.text) if difficult is not None \
                    else 0
                bnd = obj.find("bndbox")
                x1, y1, x2, y2 = [float(bnd.find(t).text) for t in
                                  ("xmin", "ymin", "xmax", "ymax")]
                annotations.append(dict(
                    id=ann_id, image_id=img_idx + 1,
                    category_id=cat2id[name],
                    bbox=[x1, y1, x2 - x1, y2 - y1],
                    area=(x2 - x1) * (y2 - y1),
                    iscrowd=0, ignore=difficult))
                ann_id += 1
        self.coco = COCO(dataset=dict(
            images=images,
            categories=[dict(id=i, name=c)
                        for i, c in enumerate(self.CLASSES)],
            annotations=annotations))
        self.cat_ids = list(range(len(self.CLASSES)))
        self.cat2label = {c: c for c in self.cat_ids}
        self.img_ids = self.coco.get_img_ids()
        out = []
        for info in images:
            info = dict(info)
            info["filename"] = info["file_name"]
            out.append(info)
        return out
