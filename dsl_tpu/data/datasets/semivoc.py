"""Semi-supervised VOC dataset: per-image JSON label store, txt image list.

Parity with ``/root/reference/mmdet/datasets/semivoc.py:18-304``: the
``ann_file`` is a plain text list of image filenames, sizes are read from
the images themselves (:64-80), and GT comes from
``{ann_path}/{filename}.json`` with the same score-triage mechanics as
SemiCOCODataset (fixed or adathres thresholds).
"""

from __future__ import annotations

import json
import os.path as osp

from dsl_tpu.data.datasets.semicoco import SemiCOCODataset
from dsl_tpu.data.datasets.voc import VOC_CLASSES
from dsl_tpu.registry import DATASETS


@DATASETS.register(name="SemiVOCDataset")
class SemiVOCDataset(SemiCOCODataset):
    CLASSES = VOC_CLASSES

    def load_annotations(self, ann_file):
        self.cat_ids = list(range(len(self.CLASSES)))
        self.cat2label = {c: c for c in self.cat_ids}
        data_infos = []
        with open(ann_file) as f:
            names = [l.strip() for l in f if l.strip()]
        # a json COCO-style list also works (filename field only)
        if len(names) == 1 and names[0].startswith("{"):
            with open(ann_file) as f:
                listing = json.load(f)
            names = [i.get("file_name", i.get("filename"))
                     for i in listing["images"]]
        from PIL import Image

        for name in names:
            w = h = 0
            path = osp.join(self.img_prefix, name)
            if osp.exists(path):
                with Image.open(path) as im:
                    w, h = im.size
            data_infos.append(dict(filename=name, width=w, height=h))
        self.img_ids = list(range(len(data_infos)))
        # minimal coco shim so inherited eval/export paths work
        from dsl_tpu.data.coco_api import COCO

        self.coco = COCO(dataset=dict(
            images=[dict(id=i, file_name=d["filename"], width=d["width"],
                         height=d["height"])
                    for i, d in enumerate(data_infos)],
            categories=[dict(id=c, name=self.CLASSES[c])
                        for c in self.cat_ids],
            annotations=[]))
        for i, d in enumerate(data_infos):
            d["id"] = i
        return data_infos
