"""Image / annotation loading transforms.

Parity with ``/root/reference/mmdet/datasets/pipelines/loading.py:1-565``
(LoadImageFromFile / LoadAnnotations) for the bbox-detection path. Images are
decoded with cv2 (BGR, matching mmcv) on the host; device-side preprocessing
happens later in the fixed-shape formatter.
"""

from __future__ import annotations

import os.path as osp

import numpy as np
import cv2

from dsl_tpu.registry import PIPELINES


@PIPELINES.register
class LoadImageFromFile:
    def __init__(self, to_float32: bool = False, color_type: str = "color"):
        self.to_float32 = to_float32
        self.color_type = color_type

    def __call__(self, results):
        if results.get("img_prefix") is not None:
            filename = osp.join(results["img_prefix"],
                                results["img_info"]["filename"])
        else:
            filename = results["img_info"]["filename"]
        flag = (cv2.IMREAD_COLOR if self.color_type == "color"
                else cv2.IMREAD_GRAYSCALE)
        img = cv2.imread(filename, flag)
        if img is None:
            raise FileNotFoundError(f"cannot read image {filename}")
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = filename
        results["ori_filename"] = results["img_info"]["filename"]
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        results["img_fields"] = ["img"]
        return results


@PIPELINES.register
class LoadImageFromWebcam(LoadImageFromFile):
    """Take a pre-decoded ndarray from ``results['img']``
    (inference_detector path, ``apis/inference.py``)."""

    def __call__(self, results):
        img = results["img"]
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = None
        results["ori_filename"] = None
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        results["img_fields"] = ["img"]
        return results


@PIPELINES.register
class LoadAnnotations:
    def __init__(self, with_bbox: bool = True, with_label: bool = True,
                 with_mask: bool = False, with_seg: bool = False,
                 poly2mask: bool = True):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask
        self.with_seg = with_seg
        self.poly2mask = poly2mask

    def __call__(self, results):
        ann = results["ann_info"]
        if self.with_bbox:
            results["gt_bboxes"] = ann["bboxes"].astype(np.float32).copy()
            ignore = ann.get("bboxes_ignore")
            if ignore is None:
                ignore = np.zeros((0, 4), np.float32)
            results["gt_bboxes_ignore"] = ignore.astype(np.float32).copy()
            results["bbox_fields"] = ["gt_bboxes", "gt_bboxes_ignore"]
        if self.with_label:
            results["gt_labels"] = ann["labels"].astype(np.int64).copy()
        if self.with_mask:
            results["gt_masks"] = self._load_masks(results, ann)
            results["mask_fields"] = ["gt_masks"]
        if self.with_seg:
            results["gt_semantic_seg"] = self._load_semantic_seg(results)
            results["seg_fields"] = ["gt_semantic_seg"]
        return results

    def _load_semantic_seg(self, results):
        """Stuff-semantic map from ``seg_prefix`` (grayscale png named after
        the image; reference ``loading.py`` LoadAnnotations._load_semantic_seg).
        Absent file → all-255 (ignore) map, so pipelines stay runnable on
        bbox-only datasets."""
        h = results["img_info"]["height"]
        w = results["img_info"]["width"]
        prefix = results.get("seg_prefix")
        if prefix:
            name = osp.splitext(results["img_info"]["filename"])[0] + ".png"
            seg = cv2.imread(osp.join(prefix, name), cv2.IMREAD_GRAYSCALE)
            if seg is not None:
                return seg.astype(np.uint8)
        return np.full((h, w), 255, np.uint8)

    def _load_masks(self, results, ann):
        """Instance masks → BitmapMasks (polygons rasterized when
        ``poly2mask``, matching reference ``loading.py`` LoadAnnotations)."""
        from dsl_tpu.core.masks import BitmapMasks, PolygonMasks

        h = results["img_info"]["height"]
        w = results["img_info"]["width"]
        raw = ann.get("masks", [])
        polys = []
        bitmaps = []
        for m in raw:
            if m is None:                  # bbox-only annotation
                m = []
            if isinstance(m, dict):       # uncompressed RLE
                from dsl_tpu.core.masks import decode_rle

                bitmaps.append(decode_rle(m))
            else:                          # list of flat polygons
                polys.append([np.asarray(p, np.float64) for p in m])
                bitmaps.append(
                    PolygonMasks([m], h, w).to_bitmap().masks[0])
        if self.poly2mask or not polys or len(bitmaps) != len(polys):
            return BitmapMasks(bitmaps, h, w)
        return PolygonMasks(polys, h, w)
