"""Box-aware geometric / photometric AutoAugment transforms.

Parity with ``/root/reference/mmdet/datasets/pipelines/auto_augment.py``
(Shear :112-326, Rotate :329-540, Translate :543-709, ColorTransform
:709-756, EqualizeTransform :758-795, BrightnessTransform :797-844,
ContrastTransform :846-900) and the mmcv image ops they call
(``imshear``/``imtranslate``/``imrotate``/``adjust_color``/``imequalize``/
``adjust_brightness``/``adjust_contrast`` — cv2 warpAffine/addWeighted
formulations). Box corner transforms, clip-to-image and the empty-box
filter are pinned to the reference's own code by
``tests/test_torch_oracle_transforms.py``.

These classes are part of mmdetection's pipeline surface; no shipped
reference config instantiates them, but user configs can.
"""

from __future__ import annotations

import cv2
import numpy as np

from dsl_tpu.registry import PIPELINES

_MAX_LEVEL = 10


def level_to_value(level, max_value):
    return (level / _MAX_LEVEL) * max_value


def enhance_level_to_value(level, a=1.8, b=0.1):
    return (level / _MAX_LEVEL) * a + b


def _border3(border_value):
    if isinstance(border_value, (int, float)):
        return tuple([float(border_value)] * 3)
    return tuple(float(v) for v in border_value)


_CV2_INTERP = dict(nearest=cv2.INTER_NEAREST, bilinear=cv2.INTER_LINEAR,
                   bicubic=cv2.INTER_CUBIC, area=cv2.INTER_AREA,
                   lanczos=cv2.INTER_LANCZOS4)


def imshear(img, magnitude, direction="horizontal", border_value=0,
            interpolation="bilinear"):
    """mmcv ``imshear``: cv2.warpAffine with [[1, m, 0], [0, 1, 0]]
    (horizontal) / [[1, 0, 0], [m, 1, 0]] (vertical)."""
    h, w = img.shape[:2]
    if direction == "horizontal":
        matrix = np.float32([[1, magnitude, 0], [0, 1, 0]])
    else:
        matrix = np.float32([[1, 0, 0], [magnitude, 1, 0]])
    bv = _border3(border_value)[:3 if img.ndim == 3 else 1]
    return cv2.warpAffine(img, matrix, (w, h),
                          flags=_CV2_INTERP[interpolation],
                          borderValue=bv if img.ndim == 3 else bv[0])


def imtranslate(img, offset, direction="horizontal", border_value=0,
                interpolation="bilinear"):
    """mmcv ``imtranslate``."""
    h, w = img.shape[:2]
    if direction == "horizontal":
        matrix = np.float32([[1, 0, offset], [0, 1, 0]])
    else:
        matrix = np.float32([[1, 0, 0], [0, 1, offset]])
    bv = _border3(border_value)[:3 if img.ndim == 3 else 1]
    return cv2.warpAffine(img, matrix, (w, h),
                          flags=_CV2_INTERP[interpolation],
                          borderValue=bv if img.ndim == 3 else bv[0])


def imrotate(img, angle, center=None, scale=1.0, border_value=0,
             interpolation="bilinear"):
    """mmcv ``imrotate``: positive angle = clockwise;
    center defaults to ((w-1)/2, (h-1)/2)."""
    h, w = img.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    matrix = cv2.getRotationMatrix2D(center, -angle, scale)
    bv = _border3(border_value)[:3 if img.ndim == 3 else 1]
    return cv2.warpAffine(img, matrix, (w, h),
                          flags=_CV2_INTERP[interpolation],
                          borderValue=bv if img.ndim == 3 else bv[0])


def adjust_color(img, alpha=1.0, beta=None, gamma=0):
    """mmcv ``adjust_color``: blend with the grayscale image."""
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    gray = np.tile(gray[..., None], (1, 1, 3))
    if beta is None:
        beta = 1 - alpha
    out = cv2.addWeighted(img.astype(np.float32), alpha,
                          gray.astype(np.float32), beta, gamma)
    return np.clip(out, 0, 255).astype(img.dtype)


def imequalize(img):
    """mmcv ``imequalize``: PIL ImageOps.equalize-style per-channel LUT."""
    def _scale_channel(im):
        histo = np.histogram(im, 256, (0, 255))[0]
        nonzero = histo[histo > 0]
        step = (np.sum(nonzero) - nonzero[-1]) // 255 if len(nonzero) else 0
        if not step:
            return im
        lut = (np.cumsum(histo) + (step // 2)) // step
        lut = np.concatenate([[0], lut[:-1]], 0)
        return np.clip(lut, 0, 255).astype(im.dtype)[im]

    return np.stack([_scale_channel(img[..., c])
                     for c in range(img.shape[-1])], axis=-1)


def adjust_brightness(img, factor=1.0):
    """mmcv ``adjust_brightness``: blend with a black image."""
    degenerated = np.zeros_like(img)
    out = cv2.addWeighted(img.astype(np.float32), factor,
                          degenerated.astype(np.float32), 1 - factor, 0)
    return np.clip(out, 0, 255).astype(img.dtype)


def adjust_contrast(img, factor=1.0):
    """mmcv ``adjust_contrast``: blend with the mean-gray image."""
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    hist = np.histogram(gray, 256, (0, 255))[0]
    mean = round(np.sum(gray) / np.sum(hist))
    degenerated = (np.ones_like(img[..., 0]) * mean).astype(img.dtype)
    degenerated = np.tile(degenerated[..., None], (1, 1, 3))
    out = cv2.addWeighted(img.astype(np.float32), factor,
                          degenerated.astype(np.float32), 1 - factor, 0)
    return np.clip(out, 0, 255).astype(img.dtype)


def _bbox_fields(results):
    fields = list(results.get("bbox_fields", []))
    if "gt_bboxes" in results and "gt_bboxes" not in fields:
        fields.append("gt_bboxes")
    return fields


_BOX2LABEL = {"gt_bboxes": "gt_labels",
              "gt_bboxes_ignore": "gt_labels_ignore"}
_BOX2MASK = {"gt_bboxes": "gt_masks",
             "gt_bboxes_ignore": "gt_masks_ignore"}


def _filter_invalid(results, min_size=0):
    """Drop boxes (and their labels/masks) with w/h <= min_size after a
    geometric warp (reference ``_filter_invalid``)."""
    for key in _bbox_fields(results):
        boxes = results[key]
        keep = ((boxes[:, 2] - boxes[:, 0] > min_size)
                & (boxes[:, 3] - boxes[:, 1] > min_size))
        keep = np.nonzero(keep)[0]
        results[key] = boxes[keep]
        lk = _BOX2LABEL.get(key)
        if lk in results:
            results[lk] = results[lk][keep]
        mk = _BOX2MASK.get(key)
        if mk in results:
            results[mk] = results[mk][keep]


def _warp_boxes(results, mat2x3_or_2x2, homogeneous: bool):
    """Corner-transform every bbox field, clip to the image, reference
    corner/clip order (min/max over the 4 warped corners, clip mins to
    [0, size], clip maxs to [min, size])."""
    h, w = results["img_shape"][:2]
    for key in _bbox_fields(results):
        boxes = results[key]
        if len(boxes) == 0:
            continue
        x1, y1, x2, y2 = [boxes[:, i] for i in range(4)]
        corners = np.stack([
            np.stack([x1, y1], 0), np.stack([x2, y1], 0),
            np.stack([x1, y2], 0), np.stack([x2, y2], 0)])  # (4, 2, n)
        corners = corners.transpose(2, 1, 0).astype(np.float32)  # (n, 2, 4)
        if homogeneous:
            ones = np.ones((len(boxes), 1, 4), np.float32)
            pts = np.concatenate([corners, ones], axis=1)    # (n, 3, 4)
        else:
            pts = corners
        new = np.matmul(mat2x3_or_2x2[None].astype(np.float32), pts)
        min_x = np.clip(new[:, 0].min(-1), 0, w)
        min_y = np.clip(new[:, 1].min(-1), 0, h)
        max_x = np.clip(new[:, 0].max(-1), min_x, w)
        max_y = np.clip(new[:, 1].max(-1), min_y, h)
        results[key] = np.stack([min_x, min_y, max_x, max_y],
                                axis=-1).astype(boxes.dtype)


@PIPELINES.register
class Shear:
    """(reference ``auto_augment.py Shear``)."""

    def __init__(self, level, img_fill_val=128, seg_ignore_label=255,
                 prob=0.5, direction="horizontal", max_shear_magnitude=0.3,
                 random_negative_prob=0.5, interpolation="bilinear"):
        assert direction in ("horizontal", "vertical")
        self.level = level
        self.magnitude = level_to_value(level, max_shear_magnitude)
        self.img_fill_val = _border3(img_fill_val)
        self.seg_ignore_label = seg_ignore_label
        self.prob = prob
        self.direction = direction
        self.random_negative_prob = random_negative_prob
        self.interpolation = interpolation

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        magnitude = self.magnitude
        if np.random.rand() < self.random_negative_prob:
            magnitude = -magnitude
        img = results["img"]
        results["img"] = imshear(
            img, magnitude, self.direction, border_value=self.img_fill_val,
            interpolation=self.interpolation).astype(img.dtype)
        if self.direction == "horizontal":
            mat = np.float32([[1, magnitude], [0, 1]])
        else:
            mat = np.float32([[1, 0], [magnitude, 1]])
        _warp_boxes(results, mat, homogeneous=False)
        for key in results.get("mask_fields", []):
            h, w = results["img_shape"][:2]
            results[key] = results[key].shear(
                (h, w), magnitude, self.direction, border_value=0,
                interpolation=self.interpolation)
        for key in results.get("seg_fields", []):
            results[key] = imshear(
                results[key], magnitude, self.direction,
                border_value=self.seg_ignore_label,
                interpolation=self.interpolation)
        _filter_invalid(results)
        return results


@PIPELINES.register
class Rotate:
    """(reference ``auto_augment.py Rotate``)."""

    def __init__(self, level, scale=1, center=None, img_fill_val=128,
                 seg_ignore_label=255, prob=0.5, max_rotate_angle=30,
                 random_negative_prob=0.5):
        self.level = level
        self.scale = scale
        self.angle = level_to_value(level, max_rotate_angle)
        self.center = center
        self.img_fill_val = _border3(img_fill_val)
        self.seg_ignore_label = seg_ignore_label
        self.prob = prob
        self.random_negative_prob = random_negative_prob

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        h, w = results["img"].shape[:2]
        center = self.center
        if center is None:
            center = ((w - 1) * 0.5, (h - 1) * 0.5)
        angle = self.angle
        if np.random.rand() < self.random_negative_prob:
            angle = -angle
        img = results["img"]
        results["img"] = imrotate(
            img, angle, center, self.scale,
            border_value=self.img_fill_val).astype(img.dtype)
        mat = cv2.getRotationMatrix2D(center, -angle, self.scale)
        _warp_boxes(results, mat, homogeneous=True)
        for key in results.get("mask_fields", []):
            hh, ww = results["img_shape"][:2]
            results[key] = results[key].rotate((hh, ww), angle, center,
                                               self.scale, fill_val=0)
        for key in results.get("seg_fields", []):
            results[key] = imrotate(
                results[key], angle, center, self.scale,
                border_value=self.seg_ignore_label)
        _filter_invalid(results)
        return results


@PIPELINES.register
class Translate:
    """(reference ``auto_augment.py Translate``)."""

    def __init__(self, level, prob=0.5, img_fill_val=128,
                 seg_ignore_label=255, direction="horizontal",
                 max_translate_offset=250., random_negative_prob=0.5,
                 min_size=0):
        assert direction in ("horizontal", "vertical")
        self.level = level
        self.offset = int(level_to_value(level, max_translate_offset))
        self.prob = prob
        self.img_fill_val = _border3(img_fill_val)
        self.seg_ignore_label = seg_ignore_label
        self.direction = direction
        self.random_negative_prob = random_negative_prob
        self.min_size = min_size

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        offset = self.offset
        if np.random.rand() < self.random_negative_prob:
            offset = -offset
        img = results["img"]
        results["img"] = imtranslate(
            img, offset, self.direction,
            border_value=self.img_fill_val).astype(img.dtype)
        h, w = results["img_shape"][:2]
        for key in _bbox_fields(results):
            boxes = results[key].copy().astype(np.float32)
            if len(boxes):
                if self.direction == "horizontal":
                    boxes[:, 0] = np.maximum(0, boxes[:, 0] + offset)
                    boxes[:, 2] = np.minimum(w, boxes[:, 2] + offset)
                else:
                    boxes[:, 1] = np.maximum(0, boxes[:, 1] + offset)
                    boxes[:, 3] = np.minimum(h, boxes[:, 3] + offset)
            results[key] = boxes
        for key in results.get("mask_fields", []):
            results[key] = results[key].translate((h, w), offset,
                                                  self.direction, fill_val=0)
        for key in results.get("seg_fields", []):
            results[key] = imtranslate(
                results[key], offset, self.direction,
                border_value=self.seg_ignore_label)
        _filter_invalid(results, min_size=self.min_size)
        return results


@PIPELINES.register
class ColorTransform:
    """(reference ``auto_augment.py ColorTransform``)."""

    def __init__(self, level, prob=0.5):
        self.level = level
        self.prob = prob
        self.factor = enhance_level_to_value(level)

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        img = results["img"]
        results["img"] = adjust_color(img, self.factor).astype(img.dtype)
        return results


@PIPELINES.register
class EqualizeTransform:
    """(reference ``auto_augment.py EqualizeTransform``)."""

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        img = results["img"]
        results["img"] = imequalize(img).astype(img.dtype)
        return results


@PIPELINES.register
class BrightnessTransform:
    """(reference ``auto_augment.py BrightnessTransform``)."""

    def __init__(self, level, prob=0.5):
        self.level = level
        self.prob = prob
        self.factor = enhance_level_to_value(level)

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        img = results["img"]
        results["img"] = adjust_brightness(img,
                                           self.factor).astype(img.dtype)
        return results


@PIPELINES.register
class ContrastTransform:
    """(reference ``auto_augment.py ContrastTransform``)."""

    def __init__(self, level, prob=0.5):
        self.level = level
        self.prob = prob
        self.factor = enhance_level_to_value(level)

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        img = results["img"]
        results["img"] = adjust_contrast(img, self.factor).astype(img.dtype)
        return results
