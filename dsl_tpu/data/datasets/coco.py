"""COCO dataset (global-annotation-file variant).

Parity with ``/root/reference/mmdet/datasets/coco.py:1-558`` for the bbox
path: category-id remapping to contiguous labels, xywh→xyxy, iscrowd →
ignore boxes, empty/small filtering, results→COCO-json export, and
``evaluate()`` with the COCO protocol (our numpy COCOeval —
``dsl_tpu/core/eval/coco_eval.py`` — replaces pycocotools).
"""

from __future__ import annotations

import numpy as np

from dsl_tpu.data.coco_api import COCO
from dsl_tpu.data.datasets.custom import CustomDataset
from dsl_tpu.registry import DATASETS

COCO_CLASSES = (
    'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus', 'train',
    'truck', 'boat', 'traffic light', 'fire hydrant', 'stop sign',
    'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse', 'sheep', 'cow',
    'elephant', 'bear', 'zebra', 'giraffe', 'backpack', 'umbrella', 'handbag',
    'tie', 'suitcase', 'frisbee', 'skis', 'snowboard', 'sports ball', 'kite',
    'baseball bat', 'baseball glove', 'skateboard', 'surfboard',
    'tennis racket', 'bottle', 'wine glass', 'cup', 'fork', 'knife', 'spoon',
    'bowl', 'banana', 'apple', 'sandwich', 'orange', 'broccoli', 'carrot',
    'hot dog', 'pizza', 'donut', 'cake', 'chair', 'couch', 'potted plant',
    'bed', 'dining table', 'toilet', 'tv', 'laptop', 'mouse', 'remote',
    'keyboard', 'cell phone', 'microwave', 'oven', 'toaster', 'sink',
    'refrigerator', 'book', 'clock', 'vase', 'scissors', 'teddy bear',
    'hair drier', 'toothbrush')


@DATASETS.register(name="CocoDataset")
class CocoDataset(CustomDataset):
    CLASSES = COCO_CLASSES

    def load_annotations(self, ann_file):
        self.coco = COCO(ann_file)
        # keep declared class order when the json provides those names
        try:
            self.cat_ids = self.coco.get_cat_ids(cat_names=self.CLASSES)
        except KeyError:
            self.cat_ids = sorted(self.coco.cats.keys())
        if not self.cat_ids:
            self.cat_ids = list(range(len(self.CLASSES)))
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.img_ids = self.coco.get_img_ids()
        data_infos = []
        for i in self.img_ids:
            info = dict(self.coco.load_imgs([i])[0])
            info["filename"] = info.get("file_name", info.get("filename"))
            data_infos.append(info)
        return data_infos

    def get_ann_info(self, idx):
        img_id = self.data_infos[idx]["id"]
        anns = self.coco.img_to_anns.get(img_id, [])
        return self._parse_ann_info(self.data_infos[idx], anns)

    def _parse_ann_info(self, img_info, anns):
        bboxes, labels, ignore = [], [], []
        for a in anns:
            if a.get("ignore", False):
                continue
            x, y, w, h = a["bbox"]
            iw = max(0, min(x + w, img_info["width"]) - max(x, 0))
            ih = max(0, min(y + h, img_info["height"]) - max(y, 0))
            if iw * ih == 0 or a.get("area", w * h) <= 0 or w < 1 or h < 1:
                continue
            if a["category_id"] not in self.cat2label:
                continue
            box = [x, y, x + w, y + h]
            if a.get("iscrowd", False):
                ignore.append(box)
            else:
                bboxes.append(box)
                labels.append(self.cat2label[a["category_id"]])
        return dict(
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            bboxes_ignore=np.asarray(ignore, np.float32).reshape(-1, 4))

    def _filter_imgs(self, min_size=32):
        valid = []
        for i, info in enumerate(self.data_infos):
            if min(info["width"], info["height"]) < min_size:
                continue
            if self.filter_empty_gt and not self.coco.img_to_anns.get(
                    info["id"]):
                continue
            valid.append(i)
        self.img_ids = [self.data_infos[i]["id"] for i in valid]
        return valid

    # -- results export / eval --------------------------------------------
    def results2json_bbox(self, results):
        """``results``: list per image of (dets (N,5), labels (N,)).

        Returns COCO-format detection dicts (xywh)."""
        out = []
        for idx, (dets, labels) in enumerate(results):
            img_id = self.data_infos[idx]["id"]
            for det, label in zip(dets, labels):
                x1, y1, x2, y2, score = det
                out.append(dict(
                    image_id=img_id,
                    bbox=[float(x1), float(y1), float(x2 - x1),
                          float(y2 - y1)],
                    score=float(score),
                    category_id=int(self.cat_ids[int(label)])))
        return out

    def evaluate(self, results, metric="bbox", iou_thrs=None,
                 verbose: bool = True):
        """COCO-protocol bbox mAP (matching ``CocoDataset.evaluate``)."""
        from dsl_tpu.core.eval.coco_eval import COCOEval

        dt = self.results2json_bbox(results)
        ev = COCOEval(self.coco, dt, iou_type="bbox",
                      img_ids=[d["id"] for d in self.data_infos],
                      cat_ids=self.cat_ids)
        stats = ev.evaluate()
        if verbose:
            ev.summarize()
        return {
            "bbox_mAP": stats["mAP"],
            "bbox_mAP_50": stats["mAP_50"],
            "bbox_mAP_75": stats["mAP_75"],
            "bbox_mAP_s": stats["mAP_s"],
            "bbox_mAP_m": stats["mAP_m"],
            "bbox_mAP_l": stats["mAP_l"],
        }
