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


@PIPELINES.register
class LoadProposals:
    """Load precomputed proposals (reference ``loading.py:495-538``):
    validates (n, 4|5), strips scores, caps at ``num_max_proposals``,
    registers 'proposals' as a bbox field. Used by the fast_rcnn /
    ga_fast / crpn_fast configs."""

    def __init__(self, num_max_proposals=None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results):
        proposals = np.asarray(results["proposals"], np.float32)
        if proposals.ndim != 2 or proposals.shape[1] not in (4, 5):
            raise AssertionError(
                "proposals should have shapes (n, 4) or (n, 5), "
                f"but found {proposals.shape}")
        proposals = proposals[:, :4]
        if self.num_max_proposals is not None:
            proposals = proposals[:self.num_max_proposals]
        if len(proposals) == 0:
            proposals = np.asarray([[0, 0, 0, 0]], np.float32)
        results["proposals"] = proposals
        results.setdefault("bbox_fields", []).append("proposals")
        return results


@PIPELINES.register
class LoadMultiChannelImageFromFiles:
    """Load and stack a list of image files as one multi-channel image
    (reference ``loading.py``): ``filename`` is a list of paths."""

    def __init__(self, to_float32=False, color_type="unchanged", **kw):
        self.to_float32 = to_float32
        self.color_type = color_type

    def __call__(self, results):
        prefix = results.get("img_prefix")
        names = results["img_info"]["filename"]
        flag = (cv2.IMREAD_UNCHANGED if self.color_type == "unchanged"
                else cv2.IMREAD_COLOR)
        imgs = []
        for name in names:
            path = osp.join(prefix, name) if prefix else name
            im = cv2.imread(path, flag)
            if im is None:
                raise FileNotFoundError(path)
            imgs.append(im)
        img = np.stack(imgs, axis=-1)
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = names
        results["ori_filename"] = results["img_info"]["filename"]
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        results.setdefault("img_fields", []).append("img")
        return results


@PIPELINES.register
class LoadPanopticAnnotations(LoadAnnotations):
    """Panoptic annotations (reference ``loading.py:393-492``): instance
    masks for things (from the dataset's panoptic id map, already decoded
    into ``ann_info['masks']`` as binary ndarrays) plus a semantic map over
    things+stuff (contiguous labels, things first, 255 void) when the
    dataset supplies ``ann_info['seg_id_map']``/``segments``/label maps."""

    def __init__(self, with_bbox=True, with_label=True, with_mask=True,
                 with_seg=True, **kw):
        super().__init__(with_bbox=with_bbox, with_label=with_label,
                         with_mask=with_mask, with_seg=with_seg, **kw)

    def _load_masks(self, results, ann):
        from dsl_tpu.core.masks import BitmapMasks

        h = results["img_info"]["height"]
        w = results["img_info"]["width"]
        raw = ann.get("masks", [])
        if raw and isinstance(raw[0], np.ndarray):
            return BitmapMasks([m.astype(np.uint8) for m in raw], h, w)
        return super()._load_masks(results, ann)

    def _load_semantic_seg(self, results):
        ann = results.get("ann_info", {})
        seg_map = ann.get("seg_id_map")
        if seg_map is None:
            return super()._load_semantic_seg(results)
        sem = np.full(seg_map.shape, 255, np.uint8)
        seg2label = ann.get("segid2label", {})
        for sid, label in seg2label.items():
            sem[seg_map == sid] = label
        return sem
