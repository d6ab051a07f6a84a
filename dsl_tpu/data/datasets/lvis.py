"""LVIS dataset (v0.5 / v1) with federated COCO-protocol evaluation.

Parity with ``/root/reference/mmdet/datasets/lvis.py:1-742`` (LVISDataset /
LVISV1Dataset): the annotation json is COCO-shaped plus per-image
``neg_category_ids`` / ``not_exhaustive_category_ids`` and per-category
``frequency`` ('r'/'c'/'f'). Evaluation follows the LVIS federated protocol:
for a category c, an image contributes only if c is annotated in it OR c is
in its ``neg_category_ids`` (everything else is "unknown" and excluded);
maxDets=300; AP is additionally reported per frequency bucket (APr/APc/APf).

The reference delegates to the external ``lvis`` package; this is a
from-scratch implementation on top of our numpy COCOEval.
"""

from __future__ import annotations

import numpy as np

from dsl_tpu.core.eval.coco_eval import COCOEval
from dsl_tpu.data.datasets.coco import CocoDataset
from dsl_tpu.registry import DATASETS


class LVISEval(COCOEval):
    """Federated evaluation: per-(img, cat) inclusion rules + maxDets 300."""

    def __init__(self, coco_gt, detections, iou_type="bbox", img_ids=None,
                 cat_ids=None, max_dets=(300,)):
        super().__init__(coco_gt, detections, iou_type=iou_type,
                         img_ids=img_ids, cat_ids=cat_ids,
                         max_dets=max_dets)
        # per-image sets for the federated rule
        self._pos = {}
        self._neg = {}
        for img_id in self.img_ids:
            info = coco_gt.imgs[img_id]
            self._pos[img_id] = {a["category_id"]
                                 for a in coco_gt.img_to_anns.get(img_id, [])}
            self._neg[img_id] = set(info.get("neg_category_ids", []))

    def _evaluate_img(self, img_id, cat_id, area_rng, max_det):
        pos = cat_id in self._pos[img_id]
        neg = cat_id in self._neg[img_id]
        if not pos and not neg:
            return None                       # unknown: excluded (federated)
        return super()._evaluate_img(img_id, cat_id, area_rng, max_det)


@DATASETS.register(name="LVISV1Dataset")
@DATASETS.register(name="LVISV05Dataset")
@DATASETS.register(name="LVISDataset")
class LVISDataset(CocoDataset):
    """v1 and v0.5 share the mechanism; class list comes from the json."""

    CLASSES = None     # read from the annotation file's categories

    def load_annotations(self, ann_file):
        from dsl_tpu.data.coco_api import COCO

        self.coco = COCO(ann_file)
        self.cat_ids = sorted(self.coco.cats.keys())
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        if self.CLASSES is None:
            self.CLASSES = tuple(
                self.coco.cats[c].get("name", str(c)) for c in self.cat_ids)
        self.img_ids = self.coco.get_img_ids()
        data_infos = []
        for i in self.img_ids:
            info = dict(self.coco.load_imgs([i])[0])
            # LVIS v1 stores the split filename inside coco_url
            name = info.get("file_name") or \
                info.get("coco_url", "").rsplit("/", 1)[-1]
            info["filename"] = name
            data_infos.append(info)
        return data_infos

    def evaluate(self, results, metric="bbox", iou_thrs=None,
                 verbose: bool = True):
        metrics = [metric] if isinstance(metric, str) else list(metric)
        out = {}
        freq = {c: self.coco.cats[c].get("frequency", "f")
                for c in self.cat_ids}
        for m in metrics:
            if m == "segm":
                dt = self.results2json_segm(results)
            else:
                dt = self.results2json_bbox(
                    [r[:2] if len(r) > 2 else r for r in results])
            ev = LVISEval(self.coco, dt, iou_type=m,
                          img_ids=[d["id"] for d in self.data_infos],
                          cat_ids=self.cat_ids)
            stats = ev.evaluate()
            out[f"{m}_mAP"] = stats["mAP"]
            out[f"{m}_mAP_50"] = stats["mAP_50"]
            out[f"{m}_mAP_75"] = stats["mAP_75"]
            # frequency-bucket APs from the accumulated precision tensor
            for bucket in ("r", "c", "f"):
                kidx = [i for i, c in enumerate(self.cat_ids)
                        if freq[c] == bucket]
                if not kidx:
                    out[f"{m}_mAP_{bucket}"] = -1.0
                    continue
                p = ev.precision[:, :, kidx, 0, len(ev.max_dets) - 1]
                p = p[p > -1]
                out[f"{m}_mAP_{bucket}"] = float(np.mean(p)) if p.size \
                    else -1.0
        if verbose:
            print({k: round(v, 4) for k, v in out.items()})
        return out


@DATASETS.register(name="CityscapesDataset")
class CityscapesDataset(CocoDataset):
    """Cityscapes in COCO format (``mmdet/datasets/cityscapes.py``): the 8
    instance classes; images without required-category annotations filtered;
    COCO-protocol evaluation (the official CS metric is a superset the
    reference only uses offline)."""

    CLASSES = ("person", "rider", "car", "truck", "bus", "train",
               "motorcycle", "bicycle")

    def _filter_imgs(self, min_size=32):
        valid = []
        cat_set = set(self.cat_ids)
        for i, info in enumerate(self.data_infos):
            if min(info["width"], info["height"]) < min_size:
                continue
            anns = self.coco.img_to_anns.get(info["id"], [])
            if self.filter_empty_gt and not any(
                    a["category_id"] in cat_set for a in anns):
                continue
            valid.append(i)
        self.img_ids = [self.data_infos[i]["id"] for i in valid]
        return valid


@DATASETS.register(name="DeepFashionDataset")
class DeepFashionDataset(CocoDataset):
    """DeepFashion landmark/clothes detection in COCO format
    (``mmdet/datasets/deepfashion.py``)."""

    CLASSES = ("top", "skirt", "leggings", "dress", "outer", "pants", "bag",
               "neckwear", "headwear", "eyeglass", "belt", "footwear",
               "hair", "skin", "face")
