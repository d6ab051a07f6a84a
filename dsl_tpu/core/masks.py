"""Instance mask structures: BitmapMasks / PolygonMasks + mask targets.

Parity with ``/root/reference/mmdet/core/mask/structures.py:1-1037`` for the
operations the detection/instance-seg pipelines use: resize, flip, crop,
pad, area, conversion polygon→bitmap, and ``mask_target`` (crop each GT mask
to its assigned proposal and resize to the RoI mask size — the training
target of mask heads). Host-side numpy/cv2; the device consumes the fixed
``(N, S, S)`` target arrays.
"""

from __future__ import annotations

import numpy as np
import cv2


class BitmapMasks:
    """(N, H, W) uint8 instance masks."""

    def __init__(self, masks, height: int, width: int):
        self.height = height
        self.width = width
        if len(masks) == 0:
            self.masks = np.empty((0, height, width), np.uint8)
        else:
            self.masks = np.stack(masks).reshape(-1, height, width) \
                .astype(np.uint8)

    def __len__(self):
        return len(self.masks)

    def __getitem__(self, idx):
        masks = self.masks[idx].reshape(-1, self.height, self.width)
        return BitmapMasks(masks, self.height, self.width)

    @property
    def areas(self) -> np.ndarray:
        return self.masks.sum((1, 2))

    def resize(self, out_shape) -> "BitmapMasks":
        h, w = out_shape
        if len(self) == 0:
            return BitmapMasks([], h, w)
        resized = np.stack([
            cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
            for m in self.masks])
        return BitmapMasks(resized, h, w)

    def rescale(self, scale_factor) -> "BitmapMasks":
        if np.isscalar(scale_factor):
            sy = sx = scale_factor
        else:
            sx, sy = scale_factor[0], scale_factor[1]
        return self.resize((int(self.height * sy + 0.5),
                            int(self.width * sx + 0.5)))

    def flip(self, direction: str = "horizontal") -> "BitmapMasks":
        axis = 2 if direction == "horizontal" else 1
        return BitmapMasks(np.flip(self.masks, axis=axis).copy(),
                           self.height, self.width)

    def crop(self, bbox) -> "BitmapMasks":
        x1, y1, x2, y2 = [int(v) for v in bbox]
        x1, y1 = max(x1, 0), max(y1, 0)
        x2 = min(max(x2, x1 + 1), self.width)
        y2 = min(max(y2, y1 + 1), self.height)
        cropped = self.masks[:, y1:y2, x1:x2]
        return BitmapMasks(cropped, y2 - y1, x2 - x1)

    def pad(self, out_shape, pad_val: int = 0) -> "BitmapMasks":
        h, w = out_shape
        padded = np.full((len(self), h, w), pad_val, np.uint8)
        padded[:, :self.height, :self.width] = self.masks
        return BitmapMasks(padded, h, w)

    def to_ndarray(self) -> np.ndarray:
        return self.masks


class PolygonMasks:
    """Per-instance lists of flat [x0, y0, x1, y1, ...] polygons."""

    def __init__(self, masks, height: int, width: int):
        self.masks = [[np.asarray(p, np.float64) for p in inst]
                      for inst in masks]
        self.height = height
        self.width = width

    def __len__(self):
        return len(self.masks)

    def rescale(self, scale_factor) -> "PolygonMasks":
        if np.isscalar(scale_factor):
            sx = sy = scale_factor
        else:
            sx, sy = scale_factor[0], scale_factor[1]
        out = []
        for inst in self.masks:
            polys = []
            for p in inst:
                q = p.copy()
                q[0::2] *= sx
                q[1::2] *= sy
                polys.append(q)
            out.append(polys)
        return PolygonMasks(out, int(self.height * sy + 0.5),
                            int(self.width * sx + 0.5))

    def flip(self, direction: str = "horizontal") -> "PolygonMasks":
        out = []
        for inst in self.masks:
            polys = []
            for p in inst:
                q = p.copy()
                if direction == "horizontal":
                    q[0::2] = self.width - q[0::2]
                else:
                    q[1::2] = self.height - q[1::2]
                polys.append(q)
            out.append(polys)
        return PolygonMasks(out, self.height, self.width)

    def to_bitmap(self) -> BitmapMasks:
        bitmaps = []
        for inst in self.masks:
            canvas = np.zeros((self.height, self.width), np.uint8)
            pts = [np.round(p).astype(np.int32).reshape(-1, 2)
                   for p in inst]
            cv2.fillPoly(canvas, pts, 1)
            bitmaps.append(canvas)
        return BitmapMasks(bitmaps, self.height, self.width)

    @property
    def areas(self) -> np.ndarray:
        # shoelace area summed over an instance's polygons
        out = []
        for inst in self.masks:
            a = 0.0
            for p in inst:
                x, y = p[0::2], p[1::2]
                a += 0.5 * abs(np.dot(x, np.roll(y, 1))
                               - np.dot(y, np.roll(x, 1)))
            out.append(a)
        return np.asarray(out)


def mask_target(gt_masks: BitmapMasks, proposals: np.ndarray,
                assigned_gt: np.ndarray, mask_size: int = 28) -> np.ndarray:
    """Crop each proposal's assigned GT mask and resize to (S, S).

    Args:
      proposals: (N, 4) xyxy; assigned_gt: (N,) GT index (< 0 → zero target).
    Returns float32 (N, S, S) in {0, 1}.
    """
    n = len(proposals)
    out = np.zeros((n, mask_size, mask_size), np.float32)
    for i in range(n):
        gi = int(assigned_gt[i])
        if gi < 0 or gi >= len(gt_masks):
            continue
        x1, y1, x2, y2 = proposals[i]
        x1 = int(np.clip(np.floor(x1), 0, gt_masks.width - 1))
        y1 = int(np.clip(np.floor(y1), 0, gt_masks.height - 1))
        x2 = int(np.clip(np.ceil(x2), x1 + 1, gt_masks.width))
        y2 = int(np.clip(np.ceil(y2), y1 + 1, gt_masks.height))
        crop = gt_masks.masks[gi, y1:y2, x1:x2]
        out[i] = cv2.resize(crop.astype(np.float32),
                            (mask_size, mask_size),
                            interpolation=cv2.INTER_LINEAR)
    return (out >= 0.5).astype(np.float32)
