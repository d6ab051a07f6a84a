"""Strong augmentations: STAC-style RandomAugmentBBox and unbiased-teacher
UBAug — fresh PIL/cv2/numpy implementations (no imgaug/torchvision).

Distribution parity targets:
- ``/root/reference/mmdet/datasets/pipelines/semi_aug.py:20-531``:
  RandAug color bank (9 PIL ops, magnitude 1..10), global affine = one of
  {translateX ±10%, translateY ±10%, rotate ±30°, shear ±30°} with cval 125,
  in-box affine (±5% / ±10°) on one randomly chosen gt box, cutout (1-5
  square patches, size 0..0.2 of min side); aug_type selects the layer list;
  boxes are clipped and emptied boxes removed afterwards.
- ``transforms.py:1922-2141`` (UBAug): SimCLR-style color jitter
  (0.4/0.4/0.4/0.1, p=0.8), grayscale p=0.2, gaussian blur sigma U[0.1,2]
  p=0.5, then 3 random-erasing passes (p .7/.5/.3) with random fill.
"""

from __future__ import annotations

import random as pyrandom

import numpy as np
import cv2
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

from dsl_tpu.registry import PIPELINES

# --------------------------------------------------------------------------
# RandAug color op bank (PIL), magnitude in [1, 10]
# --------------------------------------------------------------------------


def _to_pil(img: np.ndarray) -> Image.Image:
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))


def _from_pil(im: Image.Image) -> np.ndarray:
    return np.asarray(im)


def _enhance_factor(magnitude: int) -> float:
    # standard RandAug mapping: factor in [0.1, 1.9] symmetric around 1
    return 0.1 + (magnitude / 10.0) * 1.8


COLOR_OPS = {}


def _register_color(name):
    def deco(fn):
        COLOR_OPS[name] = fn
        return fn
    return deco


@_register_color("Identity")
def _identity(im, m):
    return im


@_register_color("AutoContrast")
def _autocontrast(im, m):
    return ImageOps.autocontrast(im)


@_register_color("Equalize")
def _equalize(im, m):
    return ImageOps.equalize(im)


@_register_color("Solarize")
def _solarize(im, m):
    thresh = int(256 - (m / 10.0) * 256)
    return ImageOps.solarize(im, thresh)


@_register_color("Color")
def _color(im, m):
    return ImageEnhance.Color(im).enhance(_enhance_factor(m))


@_register_color("Contrast")
def _contrast(im, m):
    return ImageEnhance.Contrast(im).enhance(_enhance_factor(m))


@_register_color("Brightness")
def _brightness(im, m):
    return ImageEnhance.Brightness(im).enhance(_enhance_factor(m))


@_register_color("Sharpness")
def _sharpness(im, m):
    return ImageEnhance.Sharpness(im).enhance(_enhance_factor(m))


@_register_color("Posterize")
def _posterize(im, m):
    bits = max(1, 8 - int((m / 10.0) * 4))
    return ImageOps.posterize(im, bits)


RANDOM_COLOR_POLICY_OPS = tuple(COLOR_OPS)


def apply_color_policy(img: np.ndarray, op_name: str, prob: float,
                       magnitude: int) -> np.ndarray:
    """One (op, prob, magnitude) RandAug policy entry
    (``autoaug_fast.py:apply_policy_fast`` contract)."""
    if np.random.rand() > prob:
        return img
    return _from_pil(COLOR_OPS[op_name](_to_pil(img), magnitude))


# --------------------------------------------------------------------------
# Affine (cv2): one of translateX / translateY / rotate / shear, cval=125
# --------------------------------------------------------------------------


def _affine_matrix(kind: str, h: int, w: int, strength: float) -> np.ndarray:
    if kind == "tx":
        return np.float32([[1, 0, strength * w], [0, 1, 0]])
    if kind == "ty":
        return np.float32([[1, 0, 0], [0, 1, strength * h]])
    if kind == "rotate":
        return cv2.getRotationMatrix2D((w / 2, h / 2), strength, 1.0)
    if kind == "shear":
        # imgaug shear: x-shear by `strength` degrees about the center
        s = np.tan(np.deg2rad(strength))
        return np.float32([[1, s, -s * h / 2], [0, 1, 0]])
    raise ValueError(kind)


def random_affine(img: np.ndarray, boxes: np.ndarray, weak: bool = False,
                  cval: int = 125):
    """Global affine on image + boxes; boxes mapped via their 4 corners."""
    h, w = img.shape[:2]
    kind = pyrandom.choice(["tx", "ty", "rotate", "shear"])
    if kind in ("tx", "ty"):
        lim = 0.05 if weak else 0.1
        strength = np.random.uniform(-lim, lim)
    else:
        lim = 10.0 if weak else 30.0
        strength = np.random.uniform(-lim, lim)
    mat = _affine_matrix(kind, h, w, strength)
    out = cv2.warpAffine(img, mat, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT,
                         borderValue=(cval, cval, cval))
    if boxes is not None and len(boxes):
        corners = np.stack([
            boxes[:, [0, 1]], boxes[:, [2, 1]],
            boxes[:, [0, 3]], boxes[:, [2, 3]]], axis=1)       # (N, 4, 2)
        ones = np.ones((*corners.shape[:2], 1), np.float32)
        pts = np.concatenate([corners, ones], axis=-1) @ mat.T  # (N, 4, 2)
        boxes = np.concatenate(
            [pts.min(axis=1), pts.max(axis=1)], axis=-1).astype(np.float32)
    return out, boxes


def cutout(img: np.ndarray, n_range=(1, 5), size_frac=0.2,
           fill: int = 128) -> np.ndarray:
    """1..5 square gray patches, side up to ``size_frac`` of min(H, W)."""
    h, w = img.shape[:2]
    out = img.copy()
    for _ in range(np.random.randint(n_range[0], n_range[1] + 1)):
        side = int(np.random.uniform(0, size_frac) * min(h, w))
        if side < 1:
            continue
        cy = np.random.randint(0, h)
        cx = np.random.randint(0, w)
        y1, y2 = max(0, cy - side // 2), min(h, cy + side // 2)
        x1, x2 = max(0, cx - side // 2), min(w, cx + side // 2)
        out[y1:y2, x1:x2] = fill
    return out


def _remove_empty_boxes(boxes: np.ndarray, labels: np.ndarray):
    if len(boxes) == 0:
        return boxes, labels
    keep = (boxes[:, 2] - boxes[:, 0] > 1) & (boxes[:, 3] - boxes[:, 1] > 1)
    return boxes[keep], labels[keep]


@PIPELINES.register
class RandomAugmentBBox:
    """STAC strong augmentation with selectable composition
    (``semi_aug.py:164-531``). ``aug_type``: strong / color / affine /
    cutout / color_only / except_affine / default."""

    def __init__(self, aug_type="strong", magnitude=10,
                 weighted_inbox_selection=False):
        self.aug_type = aug_type
        self.magnitude = magnitude
        self.weighted_inbox_selection = weighted_inbox_selection
        layer_map = {
            "strong": ["color", "affine_or_inbox", "cutout"],
            "strong++": ["color", "affine_or_inbox", "jitter", "cutout"],
            "default": [],
            "color": ["color", "cutout"],
            "affine": ["affine_or_inbox"],
            "cutout": ["cutout"],
            "color_only": ["color"],
            "except_affine": ["color", "affine_global", "cutout"],
        }
        if aug_type not in layer_map:
            raise NotImplementedError(f"aug_type {aug_type}")
        self.layers = layer_map[aug_type]

    # -- layer impls -------------------------------------------------------
    def _color(self, img, boxes, labels):
        op = np.random.choice(RANDOM_COLOR_POLICY_OPS)
        mag = np.random.randint(1, self.magnitude)
        return apply_color_policy(img, op, 1.0, mag), boxes, labels

    def _affine_or_inbox(self, img, boxes, labels):
        if len(boxes) and np.random.rand() < 0.5:
            return self._inbox_affine(img, boxes, labels)
        return self._affine_global(img, boxes, labels)

    def _affine_global(self, img, boxes, labels):
        img, boxes = random_affine(img, boxes, weak=False)
        return img, boxes, labels

    def _inbox_affine(self, img, boxes, labels):
        # weak affine applied to the crop of one (area-weighted optional) box
        if self.weighted_inbox_selection:
            areas = np.maximum(
                (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1)
            k = np.random.choice(len(boxes), p=areas / areas.sum())
        else:
            k = np.random.randint(len(boxes))
        x1, y1, x2, y2 = boxes[k].astype(int)
        x1, y1 = max(0, x1), max(0, y1)
        crop = img[y1:y2, x1:x2]
        if crop.size:
            warped, _ = random_affine(crop.copy(), None, weak=True)
            img = img.copy()
            img[y1:y2, x1:x2] = warped
        return img, boxes, labels

    def _cutout(self, img, boxes, labels):
        return cutout(img, (1, 5), 0.2), boxes, labels

    def _jitter(self, img, boxes, labels):
        return _color_jitter(img), boxes, labels

    def __call__(self, results):
        img = results["img"]
        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32)).copy()
        labels = results.get("gt_labels", np.zeros((0,), np.int64)).copy()

        fns = {"color": self._color, "affine_or_inbox": self._affine_or_inbox,
               "affine_global": self._affine_global, "cutout": self._cutout,
               "jitter": self._jitter}
        # random layer order, cutout always last (reference :314-321)
        layers = list(self.layers)
        tail = [l for l in layers if l == "cutout"]
        head = [l for l in layers if l != "cutout"]
        np.random.shuffle(head)
        for name in head + tail:
            img, boxes, labels = fns[name](img, boxes, labels)

        h, w = img.shape[:2]
        if len(boxes):
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
            boxes, labels = _remove_empty_boxes(boxes, labels)
        results["img"] = img.astype(np.uint8) if img.dtype != np.uint8 else img
        results["gt_bboxes"] = boxes.reshape(-1, 4).astype(np.float32)
        results["gt_labels"] = labels
        return results


@PIPELINES.register(name="RandomAugmentBBox_Fast")
class RandomAugmentBBoxFast(RandomAugmentBBox):
    """The reference's _Fast variant differs only in the color-op inner loop
    (``apply_policy_fast``); here one implementation serves both names."""


def _color_jitter(img: np.ndarray, brightness=0.4, contrast=0.4,
                  saturation=0.4, hue=0.1) -> np.ndarray:
    """torchvision ColorJitter semantics: random order, uniform factors."""
    im = _to_pil(img)
    ops = []
    if brightness:
        f = np.random.uniform(1 - brightness, 1 + brightness)
        ops.append(lambda x: ImageEnhance.Brightness(x).enhance(f))
    if contrast:
        f2 = np.random.uniform(1 - contrast, 1 + contrast)
        ops.append(lambda x: ImageEnhance.Contrast(x).enhance(f2))
    if saturation:
        f3 = np.random.uniform(1 - saturation, 1 + saturation)
        ops.append(lambda x: ImageEnhance.Color(x).enhance(f3))
    if hue:
        shift = np.random.uniform(-hue, hue)

        def _hue(x, shift=shift):
            hsv = np.asarray(x.convert("HSV")).copy()
            hsv[..., 0] = (hsv[..., 0].astype(int)
                           + int(shift * 255)) % 256
            return Image.fromarray(hsv, "HSV").convert("RGB")

        ops.append(_hue)
    np.random.shuffle(ops)
    for op in ops:
        im = op(im)
    return _from_pil(im)


def _random_erase(img: np.ndarray, p: float, scale, ratio) -> np.ndarray:
    """torchvision RandomErasing with value='random'."""
    if np.random.rand() > p:
        return img
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = np.random.uniform(*scale) * area
        log_r = np.random.uniform(np.log(ratio[0]), np.log(ratio[1]))
        r = np.exp(log_r)
        eh = int(round(np.sqrt(target * r)))
        ew = int(round(np.sqrt(target / r)))
        if eh < h and ew < w and eh > 0 and ew > 0:
            i = np.random.randint(0, h - eh + 1)
            j = np.random.randint(0, w - ew + 1)
            img = img.copy()
            img[i:i + eh, j:j + ew] = np.random.randint(
                0, 256, (eh, ew, img.shape[2]), dtype=np.uint8)
            return img
    return img


@PIPELINES.register
class UBAug:
    """Unbiased-teacher color aug (``transforms.py:2085-2141``)."""

    def __call__(self, results):
        for key in results.get("img_fields", ["img"]):
            img = np.clip(results[key], 0, 255).astype(np.uint8)
            if np.random.rand() < 0.8:
                img = _color_jitter(img)
            if np.random.rand() < 0.2:
                gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
                img = np.stack([gray] * 3, axis=-1)
            if np.random.rand() < 0.5:
                sigma = np.random.uniform(0.1, 2.0)
                img = _from_pil(_to_pil(img).filter(
                    ImageFilter.GaussianBlur(radius=sigma)))
            img = _random_erase(img, 0.7, (0.05, 0.2), (0.3, 3.3))
            img = _random_erase(img, 0.5, (0.02, 0.2), (0.1, 6.0))
            img = _random_erase(img, 0.3, (0.02, 0.2), (0.05, 8.0))
            results[key] = img
        return results
