"""Additional augmentation transforms from the mmdet pipeline surface.

Parity targets in ``/root/reference/mmdet/datasets/pipelines/transforms.py``:
RandomCrop, MinIoURandomCrop, Expand, PhotoMetricDistortion, CutOut,
RandomShift, and the box-aware AutoAugment policy wrapper
(``auto_augment.py``). Fresh numpy/cv2 implementations with matched
distributions.
"""

from __future__ import annotations

import numpy as np
import cv2

from dsl_tpu.registry import PIPELINES


def _bbox_fields(results):
    return results.get("bbox_fields", [])


@PIPELINES.register
class RandomCrop:
    """Random crop with box clipping; re-rolls handled by caller returning
    None when no gt survives (mmdet semantics with allow_negative_crop)."""

    def __init__(self, crop_size, allow_negative_crop: bool = False):
        self.crop_size = tuple(crop_size)   # (h, w)
        self.allow_negative_crop = allow_negative_crop

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        ch = min(self.crop_size[0], h)
        cw = min(self.crop_size[1], w)
        y0 = np.random.randint(0, h - ch + 1)
        x0 = np.random.randint(0, w - cw + 1)
        results["img"] = img[y0:y0 + ch, x0:x0 + cw]
        results["img_shape"] = results["img"].shape
        for key in _bbox_fields(results):
            boxes = results[key]
            if len(boxes) == 0:
                continue
            boxes = boxes - np.asarray([x0, y0, x0, y0], np.float32)
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, cw)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, ch)
            keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            results[key] = boxes[keep]
            if key == "gt_bboxes":
                results["gt_labels"] = results["gt_labels"][keep]
                if not keep.any() and not self.allow_negative_crop:
                    return None
        return results


@PIPELINES.register
class MinIoURandomCrop:
    """SSD-style IoU-constrained random crop (reference semantics: sample a
    min-IoU from the list, try 50 crops whose IoU with every gt ≥ it, keep
    boxes whose centers fall inside)."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                 min_crop_size=0.3):
        self.min_ious = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        while True:
            mode = np.random.choice(self.min_ious)
            if mode == 1:
                return results
            for _ in range(50):
                nw = np.random.uniform(self.min_crop_size * w, w)
                nh = np.random.uniform(self.min_crop_size * h, h)
                if nh / nw < 0.5 or nh / nw > 2:
                    continue
                x0 = np.random.uniform(0, w - nw)
                y0 = np.random.uniform(0, h - nh)
                patch = np.asarray([x0, y0, x0 + nw, y0 + nh])
                if len(boxes):
                    ix1 = np.maximum(boxes[:, 0], patch[0])
                    iy1 = np.maximum(boxes[:, 1], patch[1])
                    ix2 = np.minimum(boxes[:, 2], patch[2])
                    iy2 = np.minimum(boxes[:, 3], patch[3])
                    inter = (np.clip(ix2 - ix1, 0, None)
                             * np.clip(iy2 - iy1, 0, None))
                    area_b = ((boxes[:, 2] - boxes[:, 0])
                              * (boxes[:, 3] - boxes[:, 1]))
                    area_p = nw * nh
                    ious = inter / np.maximum(
                        area_b + area_p - inter, 1e-10)
                    if ious.min() < mode:
                        continue
                    cx = (boxes[:, 0] + boxes[:, 2]) / 2
                    cy = (boxes[:, 1] + boxes[:, 3]) / 2
                    keep = ((cx > patch[0]) & (cx < patch[2])
                            & (cy > patch[1]) & (cy < patch[3]))
                    if not keep.any():
                        continue
                else:
                    keep = np.zeros((0,), bool)
                results["img"] = img[int(y0):int(y0 + nh),
                                     int(x0):int(x0 + nw)]
                results["img_shape"] = results["img"].shape
                for key in _bbox_fields(results):
                    bx = results[key]
                    if len(bx) == 0:
                        continue
                    if key == "gt_bboxes":
                        bx = bx[keep]
                        results["gt_labels"] = results["gt_labels"][keep]
                    bx = bx - np.asarray([x0, y0, x0, y0], np.float32)
                    bx[:, 0::2] = np.clip(bx[:, 0::2], 0, nw)
                    bx[:, 1::2] = np.clip(bx[:, 1::2], 0, nh)
                    results[key] = bx
                return results


@PIPELINES.register
class Expand:
    """Place the image in a larger mean-filled canvas (SSD zoom-out)."""

    def __init__(self, mean=(0, 0, 0), ratio_range=(1, 4), prob=0.5):
        self.mean = tuple(mean)
        self.ratio_range = ratio_range
        self.prob = prob

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        img = results["img"]
        h, w, c = img.shape
        ratio = np.random.uniform(*self.ratio_range)
        eh, ew = int(h * ratio), int(w * ratio)
        top = np.random.randint(0, eh - h + 1)
        left = np.random.randint(0, ew - w + 1)
        canvas = np.empty((eh, ew, c), img.dtype)
        canvas[...] = np.asarray(self.mean, img.dtype)
        canvas[top:top + h, left:left + w] = img
        results["img"] = canvas
        results["img_shape"] = canvas.shape
        shift = np.asarray([left, top, left, top], np.float32)
        for key in _bbox_fields(results):
            if len(results[key]):
                results[key] = results[key] + shift
        return results


@PIPELINES.register
class PhotoMetricDistortion:
    """SSD photometric distortion chain (brightness/contrast/saturation/hue
    with the reference's probabilities and ranges)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results):
        img = results["img"].astype(np.float32)
        if np.random.randint(2):
            img = img + np.random.uniform(-self.brightness_delta,
                                          self.brightness_delta)
        contrast_first = np.random.randint(2)
        if contrast_first and np.random.randint(2):
            img = img * np.random.uniform(*self.contrast_range)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        if np.random.randint(2):
            hsv[..., 1] = hsv[..., 1] * np.random.uniform(
                *self.saturation_range)
        if np.random.randint(2):
            hsv[..., 0] = (hsv[..., 0] + np.random.uniform(
                -self.hue_delta, self.hue_delta)) % 180
        img = cv2.cvtColor(
            np.clip(hsv, 0, 255).astype(np.uint8),
            cv2.COLOR_HSV2BGR).astype(np.float32)
        if not contrast_first and np.random.randint(2):
            img = img * np.random.uniform(*self.contrast_range)
        results["img"] = np.clip(img, 0, 255)
        return results


@PIPELINES.register
class CutOut:
    """Drop n random rectangles (fill constant)."""

    def __init__(self, n_holes, cutout_shape=None, cutout_ratio=None,
                 fill_in=(0, 0, 0)):
        self.n_holes = n_holes if isinstance(n_holes, tuple) else \
            (n_holes, n_holes)
        self.cutout_shape = cutout_shape
        self.cutout_ratio = cutout_ratio
        self.fill_in = fill_in

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        n = np.random.randint(self.n_holes[0], self.n_holes[1] + 1)
        for _ in range(n):
            if self.cutout_ratio is not None:
                ratios = self.cutout_ratio
                idx = np.random.randint(len(ratios))
                ch, cw = int(h * ratios[idx][0]), int(w * ratios[idx][1])
            else:
                shapes = self.cutout_shape
                idx = np.random.randint(len(shapes))
                ch, cw = shapes[idx]
            y0 = np.random.randint(0, h)
            x0 = np.random.randint(0, w)
            img[y0:min(y0 + ch, h), x0:min(x0 + cw, w)] = self.fill_in
        results["img"] = img
        return results


@PIPELINES.register
class RandomShift:
    """Shift image + boxes by up to ``max_shift_px`` (prob ``shift_ratio``)."""

    def __init__(self, shift_ratio=0.5, max_shift_px=32, filter_thr_px=1):
        self.shift_ratio = shift_ratio
        self.max_shift_px = max_shift_px
        self.filter_thr_px = filter_thr_px

    def __call__(self, results):
        if np.random.rand() > self.shift_ratio:
            return results
        img = results["img"]
        h, w = img.shape[:2]
        dx = np.random.randint(-self.max_shift_px, self.max_shift_px + 1)
        dy = np.random.randint(-self.max_shift_px, self.max_shift_px + 1)
        canvas = np.zeros_like(img)
        ys, ye = max(dy, 0), min(h + dy, h)
        xs, xe = max(dx, 0), min(w + dx, w)
        canvas[ys:ye, xs:xe] = img[ys - dy:ye - dy, xs - dx:xe - dx]
        results["img"] = canvas
        for key in _bbox_fields(results):
            boxes = results[key]
            if len(boxes) == 0:
                continue
            boxes = boxes + np.asarray([dx, dy, dx, dy], np.float32)
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
            keep = ((boxes[:, 2] - boxes[:, 0] > self.filter_thr_px)
                    & (boxes[:, 3] - boxes[:, 1] > self.filter_thr_px))
            results[key] = boxes[keep]
            if key == "gt_bboxes":
                results["gt_labels"] = results["gt_labels"][keep]
        return results


@PIPELINES.register
class AutoAugment:
    """Box-aware AutoAugment: pick one sub-policy (list of transform cfgs)
    at random (reference ``auto_augment.py`` wrapper semantics)."""

    def __init__(self, policies):
        from dsl_tpu.data.pipelines.compose import Compose

        self.policies = [Compose(p) for p in policies]

    def __call__(self, results):
        policy = self.policies[np.random.randint(len(self.policies))]
        return policy(results)
