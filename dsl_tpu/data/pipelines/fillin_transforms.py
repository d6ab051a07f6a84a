"""Pipeline fill-ins re-imagined without their external libraries.

- :class:`Corrupt` — the reference wraps the ``imagecorruptions`` package
  (``mmdet/datasets/pipelines/transforms.py`` Corrupt); the common
  corruption set is reimplemented with cv2/numpy.
- :class:`Albu` — the reference wraps ``albumentations``
  (``transforms.py:1182-1342``); the subset of transforms detection configs
  actually use is implemented natively with the same config schema
  (``dict(type=..., p=...)``); unknown types raise.
- :class:`InstaBoost` — the reference wraps the ``instaboost`` package
  (``pipelines/instaboost.py``): instance-paste augmentation. Simplified
  native version: with prob, instances (mask required) are cut out and
  re-pasted at a jittered location; boxes/masks follow.
- :class:`RandomCenterCropPad` — CornerNet/CenterNet crop-around-center with
  mean padding (``transforms.py:1501+``), train + test modes.
"""

from __future__ import annotations

import numpy as np
import cv2

from dsl_tpu.registry import PIPELINES


def _octave_noise(h, w, rng, octaves=6, decay=0.55):
    """Multi-octave value noise in [0, 1] — plasma-like clouds (stands in
    for imagecorruptions' diamond-square ``plasma_fractal``)."""
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for k in range(octaves):
        n = 2 ** (k + 2)
        layer = cv2.resize(rng.rand(n, n).astype(np.float32), (w, h),
                           interpolation=cv2.INTER_LINEAR)
        out += amp * layer
        total += amp
        amp *= decay
    out /= total
    out -= out.min()
    return out / max(out.max(), 1e-6)


def _motion_kernel(k, angle_deg):
    """Length-k line kernel at the given angle (for snow streaks)."""
    kern = np.zeros((k, k), np.float32)
    kern[k // 2, :] = 1.0
    m = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle_deg, 1.0)
    kern = cv2.warpAffine(kern, m, (k, k))
    ssum = kern.sum()
    return kern / max(ssum, 1e-6)


@PIPELINES.register
class Corrupt:
    """Apply a named corruption at a severity (1-5).

    Covers the reference benchmark protocol's full 15-corruption set
    (``tools/analysis_tools/test_robustness.py:104-110``) plus the holdout
    set (speckle_noise, gaussian_blur, spatter, saturate). Reimplemented
    imagecorruptions-style with cv2/numpy; ``frost`` uses a procedural
    fractal-ice texture instead of the package's bundled JPEG assets
    (unavailable offline), and ``fog`` uses octave value-noise in place of
    the diamond-square plasma — same visual family, severity-monotonic.
    """

    BENCHMARK = ("gaussian_noise", "shot_noise", "impulse_noise",
                 "defocus_blur", "glass_blur", "motion_blur", "zoom_blur",
                 "snow", "frost", "fog", "brightness", "contrast",
                 "elastic_transform", "pixelate", "jpeg_compression")
    HOLDOUT = ("speckle_noise", "gaussian_blur", "spatter", "saturate")
    SUPPORTED = BENCHMARK + HOLDOUT

    def __init__(self, corruption: str = "gaussian_noise", severity: int = 1):
        if corruption not in self.SUPPORTED:
            raise ValueError(f"unsupported corruption {corruption}; "
                             f"supported: {self.SUPPORTED}")
        self.corruption = corruption
        self.severity = int(severity)

    def __call__(self, results):
        img = results["img"].astype(np.float32)
        s = self.severity
        c = self.corruption
        rng = np.random
        if c == "gaussian_noise":
            img = img + rng.randn(*img.shape) * [8, 16, 24, 32, 44][s - 1]
        elif c == "shot_noise":
            lam = [60, 25, 12, 5, 3][s - 1]
            img = rng.poisson(np.clip(img, 0, 255) / 255.0 * lam) / lam * 255
        elif c == "impulse_noise":
            frac = [0.03, 0.06, 0.09, 0.17, 0.27][s - 1]
            m = rng.rand(*img.shape[:2])
            img[m < frac / 2] = 0
            img[m > 1 - frac / 2] = 255
        elif c in ("defocus_blur", "gaussian_blur"):
            k = [3, 5, 7, 9, 11][s - 1]
            img = cv2.GaussianBlur(img, (k, k), 0)
        elif c == "motion_blur":
            k = [5, 7, 9, 13, 17][s - 1]
            kern = np.zeros((k, k), np.float32)
            kern[k // 2, :] = 1.0 / k
            img = cv2.filter2D(img, -1, kern)
        elif c == "brightness":
            img = img + [15, 30, 45, 60, 80][s - 1]
        elif c == "contrast":
            f = [0.75, 0.6, 0.45, 0.3, 0.15][s - 1]
            img = (img - img.mean()) * f + img.mean()
        elif c == "pixelate":
            f = [0.7, 0.55, 0.45, 0.35, 0.25][s - 1]
            h, w = img.shape[:2]
            small = cv2.resize(img, (max(1, int(w * f)), max(1, int(h * f))),
                               interpolation=cv2.INTER_AREA)
            img = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
        elif c == "jpeg_compression":
            q = [80, 65, 50, 35, 20][s - 1]
            ok, enc = cv2.imencode(
                ".jpg", np.clip(img, 0, 255).astype(np.uint8),
                [int(cv2.IMWRITE_JPEG_QUALITY), q])
            img = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32)
        elif c == "glass_blur":
            # blur -> local pixel shuffle x iters -> blur
            sigma, max_d, iters = [(0.7, 1, 2), (0.9, 2, 1), (1.0, 2, 3),
                                   (1.1, 3, 2), (1.5, 4, 2)][s - 1]
            img = cv2.GaussianBlur(img, (0, 0), sigma)
            h, w = img.shape[:2]
            for _ in range(iters):
                dy = rng.randint(-max_d, max_d + 1, (h, w))
                dx = rng.randint(-max_d, max_d + 1, (h, w))
                ys = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
                xs = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
                img = img[ys, xs]
            img = cv2.GaussianBlur(img, (0, 0), sigma)
        elif c == "zoom_blur":
            max_zoom = [1.11, 1.16, 1.21, 1.26, 1.31][s - 1]
            h, w = img.shape[:2]
            acc = np.zeros_like(img, np.float32)
            zooms = np.arange(1.0, max_zoom, 0.02)
            for z in zooms:
                zh, zw = max(1, int(round(h / z))), max(1, int(round(w / z)))
                y0, x0 = (h - zh) // 2, (w - zw) // 2
                acc += cv2.resize(img[y0:y0 + zh, x0:x0 + zw], (w, h),
                                  interpolation=cv2.INTER_LINEAR)
            img = (img + acc) / (len(zooms) + 1)
        elif c == "snow":
            loc, scale, zoom, thr, blur_k, mix = [
                (0.1, 0.3, 3.0, 0.5, 9, 0.8), (0.2, 0.3, 2.0, 0.5, 11, 0.7),
                (0.55, 0.3, 4.0, 0.9, 11, 0.7),
                (0.55, 0.3, 4.5, 0.85, 11, 0.65),
                (0.55, 0.3, 2.5, 0.85, 15, 0.6)][s - 1]
            h, w = img.shape[:2]
            layer = rng.normal(loc, scale, (h, w)).astype(np.float32)
            layer = cv2.resize(layer, (0, 0), fx=zoom, fy=zoom,
                               interpolation=cv2.INTER_LINEAR)[:h, :w]
            if layer.shape != (h, w):   # zoom < 1 upscale guard
                layer = cv2.resize(layer, (w, h))
            layer[layer < thr] = 0.0
            layer = cv2.filter2D(layer, -1,
                                 _motion_kernel(blur_k,
                                                rng.uniform(-135, -45)))
            gray = img.mean(axis=-1, keepdims=True)
            base = mix * img + (1 - mix) * np.maximum(
                img, gray * 1.5 + 0.5 * 255)
            snow = np.clip(layer, 0, 1)[..., None] * 255.0
            img = base + snow + np.rot90(snow, k=2, axes=(0, 1))
        elif c == "frost":
            keep, fweight = [(1.0, 0.4), (0.8, 0.6), (0.7, 0.7),
                             (0.65, 0.7), (0.6, 0.75)][s - 1]
            h, w = img.shape[:2]
            # procedural icy texture: sharpened octave noise + streaks
            tex = _octave_noise(h, w, rng, octaves=5, decay=0.7)
            tex = cv2.filter2D(tex, -1,
                               _motion_kernel(9, rng.uniform(0, 180)))
            tex = np.clip((tex - 0.4) * 2.5, 0, 1)
            frost = (tex[..., None] * np.asarray([235, 240, 255],
                                                 np.float32))
            img = keep * img + fweight * frost
        elif c == "fog":
            amt, decay = [(1.5, 0.48), (2.0, 0.48), (2.5, 0.55),
                          (2.5, 0.62), (3.0, 0.68)][s - 1]
            h, w = img.shape[:2]
            plasma = _octave_noise(h, w, rng, octaves=7, decay=decay)
            max_val = max(img.max(), 1.0)
            img = img + amt * plasma[..., None] * 255.0
            img = img * max_val / (max_val + amt * 255.0)
        elif c == "elastic_transform":
            h, w = img.shape[:2]
            ref = min(h, w)
            alpha_f, sigma_f, affine_f = [
                (2.0, 0.7, 0.1), (2.0, 0.08, 0.2), (0.05, 0.01, 0.02),
                (0.07, 0.01, 0.02), (0.12, 0.01, 0.02)][s - 1]
            # random affine jitter of a center triangle
            ctr = np.float32([w, h]) / 2
            sq = ref // 3
            pts1 = np.float32([ctr + sq, [ctr[0] + sq, ctr[1] - sq],
                               ctr - sq])
            pts2 = pts1 + rng.uniform(-affine_f * ref, affine_f * ref,
                                      pts1.shape).astype(np.float32)
            img = cv2.warpAffine(img, cv2.getAffineTransform(pts1, pts2),
                                 (w, h), borderMode=cv2.BORDER_REFLECT_101)
            # smoothed displacement field
            sigma = max(sigma_f * ref, 1.0)
            dx = cv2.GaussianBlur(
                rng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0),
                sigma) * alpha_f * ref
            dy = cv2.GaussianBlur(
                rng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0),
                sigma) * alpha_f * ref
            mx = (np.arange(w)[None, :] + dx).astype(np.float32)
            my = (np.arange(h)[:, None] + dy).astype(np.float32)
            img = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REFLECT_101)
        elif c == "speckle_noise":
            amt = [0.15, 0.2, 0.35, 0.45, 0.6][s - 1]
            img = img + img * rng.randn(*img.shape) * amt
        elif c == "spatter":
            loc, scale, sigma, thr, mud = [
                (0.65, 0.3, 4, 0.69, False), (0.65, 0.3, 3, 0.68, False),
                (0.65, 0.3, 2, 0.68, False), (0.65, 0.3, 1, 0.65, True),
                (0.67, 0.4, 1, 0.65, True)][s - 1]
            h, w = img.shape[:2]
            liquid = rng.normal(loc, scale, (h, w)).astype(np.float32)
            liquid = cv2.GaussianBlur(liquid, (0, 0), sigma)
            m = (liquid > thr).astype(np.float32)[..., None]
            color = (np.asarray([63, 42, 20], np.float32) if mud
                     else np.asarray([238, 238, 175], np.float32))  # BGR
            img = img * (1 - 0.7 * m) + color * 0.7 * m
        elif c == "saturate":
            fac, add = [(0.3, 0.0), (0.1, 0.0), (2.0, 0.0),
                        (5.0, 0.1), (20.0, 0.2)][s - 1]
            hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                               cv2.COLOR_BGR2HSV).astype(np.float32)
            hsv[..., 1] = np.clip(hsv[..., 1] * fac + add * 255, 0, 255)
            img = cv2.cvtColor(hsv.astype(np.uint8),
                               cv2.COLOR_HSV2BGR).astype(np.float32)
        results["img"] = np.clip(img, 0, 255).astype(
            results["img"].dtype if results["img"].dtype == np.uint8
            else np.float32)
        return results


@PIPELINES.register
class Albu:
    """Native subset of the albumentations wrapper: same config schema,
    image-only transforms (the detection configs' usual set)."""

    def __init__(self, transforms, bbox_params=None,
                 keymap=None, update_pad_shape=False,
                 skip_img_without_anno=False):
        self.transforms = list(transforms)
        for t in self.transforms:
            if t["type"] not in ("ShiftScaleRotate",
                                 "RandomBrightnessContrast",
                                 "HueSaturationValue", "ChannelShuffle",
                                 "Blur", "MedianBlur", "JpegCompression",
                                 "OneOf", "RGBShift"):
                raise ValueError(f"Albu transform {t['type']} not supported")

    def _apply_one(self, img, t):
        ttype = t["type"]
        if np.random.rand() > t.get("p", 0.5):
            return img
        if ttype == "OneOf":
            sub = t["transforms"][np.random.randint(len(t["transforms"]))]
            return self._apply_one(img, {**sub, "p": 1.0})
        if ttype == "ShiftScaleRotate":
            h, w = img.shape[:2]
            ang = np.random.uniform(*_pair(t.get("rotate_limit", 15)))
            scale = 1 + np.random.uniform(*_pair(t.get("scale_limit", 0.1)))
            sx = np.random.uniform(*_pair(t.get("shift_limit", 0.06))) * w
            sy = np.random.uniform(*_pair(t.get("shift_limit", 0.06))) * h
            m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, scale)
            m[:, 2] += (sx, sy)
            return cv2.warpAffine(img, m, (w, h),
                                  borderMode=cv2.BORDER_REFLECT_101)
        if ttype == "RandomBrightnessContrast":
            b = np.random.uniform(*_pair(t.get("brightness_limit", 0.2)))
            c = np.random.uniform(*_pair(t.get("contrast_limit", 0.2)))
            out = img.astype(np.float32) * (1 + c) + 255 * b
            return np.clip(out, 0, 255).astype(img.dtype)
        if ttype == "HueSaturationValue":
            hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                               cv2.COLOR_BGR2HSV).astype(np.int32)
            hsv[..., 0] += np.random.randint(
                -t.get("hue_shift_limit", 20), t.get("hue_shift_limit", 20)
                + 1)
            hsv[..., 1] += np.random.randint(
                -t.get("sat_shift_limit", 30), t.get("sat_shift_limit", 30)
                + 1)
            hsv[..., 2] += np.random.randint(
                -t.get("val_shift_limit", 20), t.get("val_shift_limit", 20)
                + 1)
            hsv[..., 0] %= 180
            hsv = np.clip(hsv, 0, 255).astype(np.uint8)
            return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR).astype(img.dtype)
        if ttype == "RGBShift":
            lim = t.get("r_shift_limit", 20)
            shift = np.random.randint(-lim, lim + 1, size=(3,))
            return np.clip(img.astype(np.int32) + shift[::-1], 0,
                           255).astype(img.dtype)
        if ttype == "ChannelShuffle":
            return img[..., np.random.permutation(3)]
        if ttype in ("Blur", "MedianBlur"):
            k = np.random.choice([3, 5])
            if ttype == "Blur":
                return cv2.blur(img, (k, k))
            return cv2.medianBlur(np.clip(img, 0, 255).astype(np.uint8),
                                  int(k)).astype(img.dtype)
        if ttype == "JpegCompression":
            q = np.random.randint(t.get("quality_lower", 80),
                                  t.get("quality_upper", 99) + 1)
            ok, enc = cv2.imencode(
                ".jpg", np.clip(img, 0, 255).astype(np.uint8),
                [int(cv2.IMWRITE_JPEG_QUALITY), int(q)])
            return cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(img.dtype)
        return img

    def __call__(self, results):
        img = results["img"]
        for t in self.transforms:
            img = self._apply_one(img, t)
        results["img"] = img
        return results


def _pair(v):
    return (-v, v) if np.isscalar(v) else tuple(v)


@PIPELINES.register
class InstaBoost:
    """Simplified instance-paste augmentation (requires ``gt_masks``):
    with prob ``aug_ratio``, each instance may be cut out (by its mask),
    its hole inpainted with the image median, and re-pasted at a jittered
    location; its box and mask move with it."""

    def __init__(self, action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5):
        self.aug_ratio = aug_ratio
        self.dx = dx
        self.dy = dy

    def __call__(self, results):
        if "gt_masks" not in results or np.random.rand() > self.aug_ratio:
            return results
        img = results["img"].copy()
        h, w = img.shape[:2]
        masks = results["gt_masks"]
        if hasattr(masks, "to_bitmap"):
            masks = masks.to_bitmap()
        mask_arr = masks.masks.copy()
        boxes = results["gt_bboxes"].copy()
        fill = np.median(img.reshape(-1, img.shape[-1]), axis=0)
        for i in range(len(boxes)):
            ox = np.random.randint(-min(self.dx, w // 8),
                                   min(self.dx, w // 8) + 1)
            oy = np.random.randint(-min(self.dy, h // 8),
                                   min(self.dy, h // 8) + 1)
            if ox == 0 and oy == 0:
                continue
            m = mask_arr[i].astype(bool)
            x1, y1, x2, y2 = boxes[i]
            if x2 + ox > w or y2 + oy > h or x1 + ox < 0 or y1 + oy < 0:
                continue
            patch = img * m[..., None]
            img[m] = fill
            shifted = np.roll(np.roll(m, oy, axis=0), ox, axis=1)
            patch_sh = np.roll(np.roll(patch, oy, axis=0), ox, axis=1)
            img = np.where(shifted[..., None], patch_sh, img)
            mask_arr[i] = shifted.astype(np.uint8)
            boxes[i] = [x1 + ox, y1 + oy, x2 + ox, y2 + oy]
        from dsl_tpu.core.masks import BitmapMasks

        results["img"] = img
        results["gt_bboxes"] = boxes
        results["gt_masks"] = BitmapMasks(mask_arr, h, w)
        return results


@PIPELINES.register
class RandomCenterCropPad:
    """CornerNet/CenterNet center crop + around padding
    (reference ``transforms.py:1501+``): train mode crops a
    ratio-scaled window around a random center (kept only if it retains a
    gt box center) and mean-pads; test mode mean-pads around the center to
    a size-divisor canvas, recording ``border``."""

    def __init__(self, crop_size=None, ratios=(0.9, 1.0, 1.1), border=128,
                 mean=(0, 0, 0), std=(1, 1, 1), to_rgb=False,
                 test_mode=False, test_pad_mode=("logical_or", 127),
                 bbox_clip_border=True):
        self.crop_size = crop_size
        self.ratios = ratios
        self.border = border
        self.mean = np.asarray(mean, np.float32)
        self.test_mode = test_mode
        self.test_pad_mode = test_pad_mode
        self.bbox_clip_border = bbox_clip_border

    @staticmethod
    def _get_border(border, size):
        k = 2 * border / size
        i = int(np.ceil(np.log2(k))) if k > 1 else 0
        return border // (2 ** i)

    def _filter_centers(self, patch, boxes):
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        return (cx > patch[0]) & (cy > patch[1]) & (cx < patch[2]) \
            & (cy < patch[3])

    def __call__(self, results):
        if self.test_mode:
            return self._test_aug(results)
        return self._train_aug(results)

    def _train_aug(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        for _ in range(50):
            scale = float(np.random.choice(self.ratios))
            ch, cw = self.crop_size or (h, w)
            new_h, new_w = int(ch * scale), int(cw * scale)
            hb = self._get_border(self.border, h)
            wb = self._get_border(self.border, w)
            cx = np.random.randint(wb, max(w - wb, wb + 1))
            cy = np.random.randint(hb, max(h - hb, hb + 1))
            x0 = max(cx - new_w // 2, 0)
            y0 = max(cy - new_h // 2, 0)
            x1 = min(cx + new_w // 2, w)
            y1 = min(cy + new_h // 2, h)
            patch = (x0, y0, x1, y1)
            keep = self._filter_centers(patch, boxes) if len(boxes) else \
                np.zeros((0,), bool)
            if len(boxes) and not keep.any():
                continue
            out = np.empty((new_h, new_w, 3), img.dtype)
            out[:] = self.mean
            left = new_w // 2 - (cx - x0)
            top = new_h // 2 - (cy - y0)
            out[top:top + (y1 - y0), left:left + (x1 - x0)] = \
                img[y0:y1, x0:x1]
            results["img"] = out
            results["img_shape"] = out.shape
            results["pad_shape"] = out.shape
            for key in results.get("bbox_fields", []):
                bxs = results[key]
                if not len(bxs):
                    continue
                m = self._filter_centers(patch, bxs)
                bxs = bxs[m].copy()
                bxs[:, 0::2] += left - x0
                bxs[:, 1::2] += top - y0
                if self.bbox_clip_border:
                    bxs[:, 0::2] = np.clip(bxs[:, 0::2], 0, new_w)
                    bxs[:, 1::2] = np.clip(bxs[:, 1::2], 0, new_h)
                ok = (bxs[:, 2] > bxs[:, 0]) & (bxs[:, 3] > bxs[:, 1])
                results[key] = bxs[ok]
                if key == "gt_bboxes" and "gt_labels" in results:
                    results["gt_labels"] = results["gt_labels"][m][ok]
            return results
        return results

    def _test_aug(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        if self.test_pad_mode[0] == "logical_or":
            d = self.test_pad_mode[1]
            new_h, new_w = h | d, w | d
        else:
            d = self.test_pad_mode[1]
            new_h = (h + d - 1) // d * d
            new_w = (w + d - 1) // d * d
        out = np.empty((new_h, new_w, 3), img.dtype)
        out[:] = self.mean
        top = (new_h - h) // 2
        left = (new_w - w) // 2
        out[top:top + h, left:left + w] = img
        results["img"] = out
        results["img_shape"] = out.shape
        results["pad_shape"] = out.shape
        results["border"] = np.asarray([top, top + h, left, left + w])
        return results
