"""COCO panoptic dataset + PQ evaluation.

Parity with ``/root/reference/mmdet/datasets/coco_panoptic.py``: annotations
are a panoptic json (per-image ``segments_info`` + a PNG id map encoded as
``R + G*256 + B*256^2``); thing segments become detection GT (boxes +
instance masks) so the detection pipeline trains unchanged, stuff segments
are kept for the semantic channel; ``evaluate(metric='PQ')`` implements the
panoptic-quality protocol (segment matching at IoU > 0.5, PQ = SQ x RQ)
over predicted panoptic id maps.
"""

from __future__ import annotations

import json
import os.path as osp

import numpy as np

from dsl_tpu.data.datasets.coco import CocoDataset
from dsl_tpu.registry import DATASETS

VOID = 0


def rgb2id(arr: np.ndarray) -> np.ndarray:
    """Panoptic PNG encoding (panopticapi convention)."""
    arr = arr.astype(np.uint32)
    return arr[..., 0] + arr[..., 1] * 256 + arr[..., 2] * 256 * 256


@DATASETS.register
class CocoPanopticDataset(CocoDataset):
    """``ann_file`` is the panoptic json; ``seg_prefix`` holds the PNG id
    maps. Things (``isthing=1``) are the detection classes."""

    def __init__(self, *args, seg_prefix="", **kwargs):
        self.seg_prefix = seg_prefix
        super().__init__(*args, **kwargs)

    def load_annotations(self, ann_file):
        with open(ann_file) as f:
            pan = json.load(f)
        self.categories = {c["id"]: c for c in pan["categories"]}
        self.thing_ids = [cid for cid, c in self.categories.items()
                          if c.get("isthing", 1)]
        self.stuff_ids = [cid for cid, c in self.categories.items()
                          if not c.get("isthing", 1)]
        self.cat_ids = self.thing_ids
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.CLASSES = [self.categories[c]["name"] for c in self.cat_ids]
        self.img_ids = [img["id"] for img in pan["images"]]
        self._img_infos = {img["id"]: img for img in pan["images"]}
        self._pan_anns = {a["image_id"]: a for a in pan["annotations"]}
        data_infos = []
        for i in self.img_ids:
            info = dict(self._img_infos[i])
            info["filename"] = info.get("file_name", "")
            data_infos.append(info)
        return data_infos

    def _seg_map(self, img_id):
        ann = self._pan_anns[img_id]
        path = osp.join(self.seg_prefix or "", ann["file_name"])
        import cv2

        png = cv2.imread(path, cv2.IMREAD_COLOR)[:, :, ::-1]
        return rgb2id(png), ann["segments_info"]

    def get_ann_info(self, idx):
        img_id = self.data_infos[idx]["id"]
        seg_id_map, segments = self._seg_map(img_id)
        bboxes, labels, masks = [], [], []
        for seg in segments:
            cid = seg["category_id"]
            if cid not in self.cat2label:
                continue                          # stuff: not a detection gt
            if seg.get("iscrowd", 0):
                continue
            m = seg_id_map == seg["id"]
            if not m.any():
                continue
            ys, xs = np.where(m)
            bboxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
            labels.append(self.cat2label[cid])
            masks.append(m.astype(np.uint8))
        bboxes = (np.asarray(bboxes, np.float32) if bboxes
                  else np.zeros((0, 4), np.float32))
        # semantic-map info for LoadPanopticAnnotations: contiguous labels,
        # things first then stuff (mmdet panoptic convention), 255 void
        stuff2label = {cid: len(self.cat_ids) + i
                       for i, cid in enumerate(self.stuff_ids)}
        segid2label = {}
        for seg in segments:
            cid = seg["category_id"]
            if cid in self.cat2label:
                segid2label[seg["id"]] = self.cat2label[cid]
            elif cid in stuff2label:
                segid2label[seg["id"]] = stuff2label[cid]
        return dict(bboxes=bboxes,
                    labels=np.asarray(labels, np.int64),
                    bboxes_ignore=np.zeros((0, 4), np.float32),
                    masks=masks,
                    seg_id_map=seg_id_map,
                    segid2label=segid2label)

    def evaluate(self, results, metric="PQ", verbose: bool = False,
                 **kwargs):
        """PQ over (pred_id_map, pred_segments) pairs per image.

        ``results[i]`` = (id_map (H, W) int, segments: list of dicts with
        ``id`` and ``category_id``)."""
        stats = {cid: dict(tp=0, fp=0, fn=0, iou=0.0)
                 for cid in self.categories}
        for idx, (pred_map, pred_segs) in enumerate(results):
            img_id = self.data_infos[idx]["id"]
            gt_map, gt_segs = self._seg_map(img_id)
            gt_by_id = {s["id"]: s for s in gt_segs}
            pred_by_id = {s["id"]: s for s in pred_segs}
            matched_gt, matched_pred = set(), set()
            # intersection counting over the combined id pair map
            pair = gt_map.astype(np.uint64) * (2 ** 32) \
                + pred_map.astype(np.uint64)
            ids, counts = np.unique(pair, return_counts=True)
            gt_area = {s["id"]: (gt_map == s["id"]).sum() for s in gt_segs}
            pr_area = {s["id"]: (pred_map == s["id"]).sum()
                       for s in pred_segs}
            for pid, inter in zip(ids, counts):
                g = int(pid // (2 ** 32))
                p = int(pid % (2 ** 32))
                if g not in gt_by_id or p not in pred_by_id:
                    continue
                if gt_by_id[g]["category_id"] != \
                        pred_by_id[p]["category_id"]:
                    continue
                union = gt_area[g] + pr_area[p] - inter
                iou = inter / max(union, 1)
                if iou > 0.5:
                    cid = gt_by_id[g]["category_id"]
                    stats[cid]["tp"] += 1
                    stats[cid]["iou"] += iou
                    matched_gt.add(g)
                    matched_pred.add(p)
            for s in gt_segs:
                if s["id"] not in matched_gt:
                    stats[s["category_id"]]["fn"] += 1
            for s in pred_segs:
                if s["id"] not in matched_pred and \
                        s["category_id"] in stats:
                    stats[s["category_id"]]["fp"] += 1

        pqs = []
        for cid, st in stats.items():
            denom = st["tp"] + 0.5 * st["fp"] + 0.5 * st["fn"]
            if denom == 0:
                continue
            pqs.append(st["iou"] / denom)
        pq = float(np.mean(pqs)) if pqs else 0.0
        return {"PQ": pq}
