"""Geometric / photometric transforms (host-side numpy+cv2).

Parity targets in ``/root/reference/mmdet/datasets/pipelines/transforms.py``:
Resize (multiscale value mode, keep_ratio, ``scale_idx`` meta, :123-129),
RandomFlip, Normalize, Pad (size_divisor), plus the DSL additions
PatchShuffle (:2144-2249) and ZeroIgnore (:2258-2284). Distributions are
matched; the code is fresh numpy.
"""

from __future__ import annotations

import random as pyrandom

import numpy as np
import cv2

from dsl_tpu.registry import PIPELINES


def _bbox_fields(results):
    return results.get("bbox_fields", [])


def _mask_fields(results):
    return results.get("mask_fields", [])


def _seg_fields(results):
    return results.get("seg_fields", [])


@PIPELINES.register
class Resize:
    """Resize image + boxes. ``img_scale`` is (long, short) tuples like mmdet.

    multiscale_mode 'value': pick one scale at random per sample; 'range':
    sample long/short uniformly between the two scales.
    """

    def __init__(self, img_scale=None, multiscale_mode="range",
                 keep_ratio=True, bbox_clip_border=True):
        if img_scale is None:
            self.img_scale = None
        elif isinstance(img_scale, list):
            self.img_scale = [tuple(s) for s in img_scale]
        else:
            self.img_scale = [tuple(img_scale)]
        self.multiscale_mode = multiscale_mode
        self.keep_ratio = keep_ratio
        self.bbox_clip_border = bbox_clip_border

    def _pick_scale(self):
        if len(self.img_scale) == 1:
            return self.img_scale[0], 0
        if self.multiscale_mode == "value":
            idx = np.random.randint(len(self.img_scale))
            return self.img_scale[idx], idx
        # 'range'
        longs = [max(s) for s in self.img_scale]
        shorts = [min(s) for s in self.img_scale]
        long_edge = np.random.randint(min(longs), max(longs) + 1)
        short_edge = np.random.randint(min(shorts), max(shorts) + 1)
        return (long_edge, short_edge), None

    def __call__(self, results):
        if "scale" in results and results["scale"] is not None:
            scale, scale_idx = tuple(results["scale"]), results.get("scale_idx")
        else:
            scale, scale_idx = self._pick_scale()
        img = results["img"]
        h, w = img.shape[:2]
        if self.keep_ratio:
            max_long, max_short = max(scale), min(scale)
            factor = min(max_long / max(h, w), max_short / min(h, w))
            new_w, new_h = int(w * factor + 0.5), int(h * factor + 0.5)
        else:
            new_w, new_h = scale[0], scale[1]
        out = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        w_scale = new_w / w
        h_scale = new_h / h
        results["img"] = out
        results["img_shape"] = out.shape
        results["pad_shape"] = out.shape
        results["scale_factor"] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        results["scale"] = scale
        results["scale_idx"] = scale_idx
        results["keep_ratio"] = self.keep_ratio
        for key in _bbox_fields(results):
            boxes = results[key]
            if len(boxes) == 0:
                continue
            boxes = boxes * results["scale_factor"]
            if self.bbox_clip_border:
                boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, new_w)
                boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, new_h)
            results[key] = boxes
        for key in _mask_fields(results):
            results[key] = results[key].resize((new_h, new_w))
        for key in _seg_fields(results):
            results[key] = cv2.resize(results[key], (new_w, new_h),
                                      interpolation=cv2.INTER_NEAREST)
        return results


@PIPELINES.register
class RandomFlip:
    def __init__(self, flip_ratio=None, direction="horizontal"):
        self.flip_ratio = flip_ratio
        self.direction = direction

    def __call__(self, results):
        if "flip" not in results:
            flip = (self.flip_ratio is not None
                    and np.random.rand() < self.flip_ratio)
            results["flip"] = flip
            results["flip_direction"] = self.direction if flip else None
        if results["flip"]:
            img = results["img"]
            h, w = img.shape[:2]
            if results["flip_direction"] == "horizontal":
                results["img"] = img[:, ::-1].copy()
                for key in _bbox_fields(results):
                    b = results[key].copy()
                    if len(b):
                        b[:, 0], b[:, 2] = w - results[key][:, 2], \
                            w - results[key][:, 0]
                    results[key] = b
            else:
                results["img"] = img[::-1].copy()
                for key in _bbox_fields(results):
                    b = results[key].copy()
                    if len(b):
                        b[:, 1], b[:, 3] = h - results[key][:, 3], \
                            h - results[key][:, 1]
                    results[key] = b
            for key in _mask_fields(results):
                results[key] = results[key].flip(results["flip_direction"])
            for key in _seg_fields(results):
                results[key] = (results[key][:, ::-1]
                                if results["flip_direction"] == "horizontal"
                                else results[key][::-1]).copy()
        return results


@PIPELINES.register
class Normalize:
    def __init__(self, mean, std, to_rgb=True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results["img"].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        img = (img - self.mean) / self.std
        results["img"] = img
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register
class Pad:
    """Pad to fixed size or size divisor (right/bottom zero pad)."""

    def __init__(self, size=None, size_divisor=None, pad_val=0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = (h + d - 1) // d * d, (w + d - 1) // d * d
        out = np.full((th, tw) + img.shape[2:], self.pad_val, img.dtype)
        out[:h, :w] = img
        results["img"] = out
        for key in _mask_fields(results):
            results[key] = results[key].pad((th, tw))
        for key in _seg_fields(results):
            seg = results[key]
            padded = np.full((th, tw), 255, seg.dtype)
            padded[:seg.shape[0], :seg.shape[1]] = seg
            results[key] = padded
        results["pad_shape"] = out.shape
        results["pad_fixed_size"] = self.size
        results["pad_size_divisor"] = self.size_divisor
        return results


@PIPELINES.register
class SegRescale:
    """Rescale the stuff-semantic map by ``scale_factor`` (nearest interp) —
    HTC trains its fused semantic head at 1/8 feature resolution (reference
    ``transforms.py`` SegRescale, configs/_base_/datasets/
    coco_instance_semantic.py)."""

    def __init__(self, scale_factor=1.0):
        self.scale_factor = scale_factor

    def __call__(self, results):
        if self.scale_factor == 1:
            return results
        for key in _seg_fields(results):
            seg = results[key]
            nh = int(seg.shape[0] * self.scale_factor + 0.5)
            nw = int(seg.shape[1] * self.scale_factor + 0.5)
            results[key] = cv2.resize(seg, (nw, nh),
                                      interpolation=cv2.INTER_NEAREST)
        return results


@PIPELINES.register
class PatchShuffle:
    """DSL strong aug: split the image at a random fraction along x ('flip')
    or y ('flop'), swap the two pieces, and remap/split boxes across the seam
    (reference ``transforms.py:2144-2249``)."""

    def __init__(self, ratio=0.5, ranges=(0.2, 0.8), mode=("flip", "flop")):
        self.ratio = ratio
        self.ranges = list(ranges)
        self.mode = list(mode)

    def __call__(self, results):
        if np.random.rand() > self.ratio:
            results["PS"] = False
            results["PS_place"] = None
            results["PS_mode"] = None
            return results
        img = results["img"]
        h, w = img.shape[:2]
        place = (np.random.rand() * abs(self.ranges[1] - self.ranges[0])
                 + self.ranges[0])
        mode = pyrandom.choice(self.mode)
        results["PS"], results["PS_place"], results["PS_mode"] = (
            True, place, mode)
        if mode == "flip":
            crop_w, crop_h = min(int(round(w * place)), w), h
            if crop_w in (0, w):
                return results
            img = np.concatenate([img[:, crop_w:], img[:, :crop_w]], axis=1)
        else:  # 'flop'
            crop_h, crop_w = min(int(round(h * place)), h), w
            if crop_h in (0, h):
                return results
            img = np.concatenate([img[crop_h:], img[:crop_h]], axis=0)
        results["img"] = img

        for key in _bbox_fields(results):
            boxes = results[key]
            if len(boxes) == 0:
                continue
            new_boxes, new_labels = [], []
            labels = results.get("gt_labels") if key == "gt_bboxes" else None
            for i, (x1, y1, x2, y2) in enumerate(boxes):
                # box entirely on one side of the seam?
                whole = ((x1 - crop_w + 1) * (x2 - crop_w + 1) >= 0
                         and (y1 - crop_h + 1) * (y2 - crop_h + 1) >= 0)
                if whole:
                    if mode == "flip":
                        if x1 - crop_w + 1 < 0:      # left piece -> right
                            x1, x2 = x1 + w - crop_w, x2 + w - crop_w
                        elif x2 - crop_w + 1 > 0:    # right piece -> left
                            x1, x2 = x1 - crop_w, x2 - crop_w
                    else:
                        if y1 - crop_h + 1 < 0:
                            y1, y2 = y1 + h - crop_h, y2 + h - crop_h
                        elif y2 - crop_h + 1 > 0:
                            y1, y2 = y1 - crop_h, y2 - crop_h
                    new_boxes.append([x1, y1, x2, y2])
                    if labels is not None:
                        new_labels.append(labels[i])
                else:
                    # box straddles the seam: split into two boxes
                    if mode == "flip":
                        new_boxes.append([x1 + w - crop_w, y1, w - 1, y2])
                        new_boxes.append([0, y1, x2 - crop_w, y2])
                    else:
                        new_boxes.append([x1, y1 + h - crop_h, x2, h - 1])
                        new_boxes.append([x1, 0, x2, y2 - crop_h])
                    if labels is not None:
                        new_labels.extend([labels[i], labels[i]])
            results[key] = np.asarray(new_boxes, np.float32).reshape(-1, 4)
            if labels is not None:
                results["gt_labels"] = np.asarray(new_labels, np.int64)
        return results


@PIPELINES.register
class ZeroIgnore:
    """Blank pixels of ignore boxes that overlap no real GT box
    (reference ``transforms.py:2258-2284``)."""

    def __init__(self, ratio=0.5, fill_in=(0, 0, 0)):
        self.ratio = ratio
        self.fill_in = fill_in

    def __call__(self, results):
        ig = results.get("gt_bboxes_ignore")
        if ig is None or len(ig) == 0:
            return results
        gt = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        img = results["img"]
        for i in range(len(ig)):
            if np.random.rand() <= self.ratio:
                x1, y1, x2, y2 = ig[i]
                overlaps = False
                for j in range(len(gt)):
                    ix1, iy1 = max(x1, gt[j, 0]), max(y1, gt[j, 1])
                    ix2, iy2 = min(x2, gt[j, 2]), min(y2, gt[j, 3])
                    if ix2 - ix1 >= 0 and iy2 - iy1 >= 0:
                        overlaps = True
                        break
                if not overlaps:
                    img[int(y1):int(y2), int(x1):int(x2), :] = self.fill_in
        results["img"] = img
        return results


@PIPELINES.register
class MultiScaleFlipAug:
    """Test-time wrapper: apply inner transforms at fixed scale(s)
    (reference ``test_time_aug.py``). Only the single-scale no-flip case is
    exercised by the DSL configs; flip-TTA supported for
    ``inference_model``'s eval_flip (``unlabel_pred_hook.py:194-242``)."""

    def __init__(self, transforms, img_scale=None, flip=False,
                 flip_direction="horizontal"):
        from dsl_tpu.data.pipelines.compose import Compose

        self.transforms = Compose(transforms)
        self.img_scale = ([tuple(img_scale)] if isinstance(img_scale, tuple)
                          or (isinstance(img_scale, list)
                              and np.isscalar(img_scale[0]))
                          else [tuple(s) for s in (img_scale or [])])
        self.flip = flip
        self.flip_direction = flip_direction

    def __call__(self, results):
        aug_results = []
        flips = [False, True] if self.flip else [False]
        for scale in self.img_scale:
            for f in flips:
                r = {k: (v.copy() if isinstance(v, np.ndarray) else v)
                     for k, v in results.items()}
                r["scale"] = scale
                r["scale_idx"] = None
                r["flip"] = f
                r["flip_direction"] = self.flip_direction if f else None
                aug_results.append(self.transforms(r))
        # merge: list values per key
        merged = {}
        for key in aug_results[0]:
            merged[key] = [r[key] for r in aug_results]
        return merged


@PIPELINES.register
class ImageToTensor:
    """No-op marker for config parity (arrays stay numpy until batch build)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        return results


@PIPELINES.register
class DefaultFormatBundle:
    """Marker for config parity; actual fixed-shape bundling happens in
    ``dsl_tpu.data.formatting.build_batch`` (TPU needs K-padded static
    shapes, not DataContainers)."""

    def __call__(self, results):
        return results


@PIPELINES.register
class Collect:
    def __init__(self, keys, meta_keys=None):
        self.keys = list(keys)
        self.meta_keys = list(meta_keys or [])

    def __call__(self, results):
        data = {k: results.get(k) for k in self.keys}
        data["img_metas"] = {k: results.get(k) for k in self.meta_keys} if \
            self.meta_keys else {
                k: results.get(k)
                for k in ("filename", "ori_filename", "ori_shape",
                          "img_shape", "pad_shape", "scale_factor",
                          "scale_idx", "flip", "flip_direction")}
        return data


@PIPELINES.register
class ToTensor:
    """Array-ify the given keys (reference ``formating.py ToTensor`` —
    device arrays are produced at batch build time here, so this is a
    contiguous-ndarray conversion)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for k in self.keys:
            results[k] = np.ascontiguousarray(results[k])
        return results


@PIPELINES.register
class Transpose:
    """(reference ``formating.py Transpose``)."""

    def __init__(self, keys, order):
        self.keys = keys
        self.order = order

    def __call__(self, results):
        for k in self.keys:
            results[k] = np.transpose(results[k], self.order)
        return results


@PIPELINES.register
class ToDataContainer:
    """(reference ``formating.py ToDataContainer``) — DataContainer has no
    TPU analog (batches are fixed-shape arrays); the fields pass through
    unchanged so reference configs keep building."""

    def __init__(self, fields=(dict(key="img", stack=True),
                               dict(key="gt_bboxes"),
                               dict(key="gt_labels"))):
        self.fields = fields

    def __call__(self, results):
        return results


@PIPELINES.register
class WrapFieldsToLists:
    """(reference ``formating.py WrapFieldsToLists``): single-image
    inference convenience — every field becomes a one-element list."""

    def __call__(self, results):
        return {k: [v] for k, v in results.items()}


@PIPELINES.register
class FilterAnnotations:
    """Drop gt boxes smaller than ``min_gt_bbox_wh`` (reference
    ``loading.py:540-565``); returns None when nothing survives (the
    dataset retries another sample)."""

    def __init__(self, min_gt_bbox_wh):
        self.min_gt_bbox_wh = tuple(min_gt_bbox_wh)

    def __call__(self, results):
        gt = results["gt_bboxes"]
        w = gt[:, 2] - gt[:, 0]
        h = gt[:, 3] - gt[:, 1]
        keep = (w > self.min_gt_bbox_wh[0]) & (h > self.min_gt_bbox_wh[1])
        if not keep.any():
            return None
        for key in ("gt_bboxes", "gt_labels", "gt_masks", "gt_semantic_seg"):
            if key in results:
                results[key] = results[key][keep]
        return results
