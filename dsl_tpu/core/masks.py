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

    def translate(self, out_shape, offset, direction: str = "horizontal",
                  fill_val: int = 0) -> "BitmapMasks":
        """(reference ``structures.py BitmapMasks.translate``): warp each
        mask by a pixel offset, nearest semantics for binary content."""
        h, w = out_shape
        if len(self) == 0:
            return BitmapMasks([], h, w)
        from dsl_tpu.data.pipelines.geometric import imtranslate

        out = np.stack([
            imtranslate(m, offset, direction, border_value=fill_val)
            for m in self.masks.astype(np.uint8)])
        return BitmapMasks(out.astype(np.uint8), h, w)

    def shear(self, out_shape, magnitude, direction: str = "horizontal",
              border_value: int = 0,
              interpolation: str = "bilinear") -> "BitmapMasks":
        """(reference ``BitmapMasks.shear``)."""
        h, w = out_shape
        if len(self) == 0:
            return BitmapMasks([], h, w)
        from dsl_tpu.data.pipelines.geometric import imshear

        out = np.stack([
            imshear(m, magnitude, direction, border_value=border_value,
                    interpolation=interpolation)
            for m in self.masks.astype(np.uint8)])
        return BitmapMasks(out.astype(np.uint8), h, w)

    def rotate(self, out_shape, angle, center=None, scale: float = 1.0,
               fill_val: int = 0) -> "BitmapMasks":
        """(reference ``BitmapMasks.rotate``)."""
        h, w = out_shape
        if len(self) == 0:
            return BitmapMasks([], h, w)
        from dsl_tpu.data.pipelines.geometric import imrotate

        out = np.stack([
            imrotate(m, angle, center=center, scale=scale,
                     border_value=fill_val)
            for m in self.masks.astype(np.uint8)])
        return BitmapMasks(out.astype(np.uint8), h, w)

    def to_ndarray(self) -> np.ndarray:
        return self.masks


def rasterize_polygons(polys, height: int, width: int) -> np.ndarray:
    """Even-odd pixel-center rasterization of a list of flat polygons.

    A pixel (i, j) is foreground iff its center (j+0.5, i+0.5) lies inside an
    odd number of polygon boundaries — the pycocotools convention for
    polygon→RLE (``maskUtils.frPyObjects``): a square [x1,y1,x2,y2] covers
    exactly (x2-x1)×(y2-y1) pixels, where cv2.fillPoly would include both
    boundary edges (+1 row/col) and silently shift segm mAP."""
    mask = np.zeros((height, width), np.uint8)
    for p in polys:
        p = np.asarray(p, np.float64).reshape(-1, 2)
        if len(p) < 3:
            continue
        x, y = p[:, 0], p[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        yc = np.arange(height) + 0.5                        # (H,)
        # edges crossing each scanline (half-open [min, max) convention)
        ylo = np.minimum(y, y2)[None, :]
        yhi = np.maximum(y, y2)[None, :]
        crosses = (yc[:, None] >= ylo) & (yc[:, None] < yhi)  # (H, E)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (yc[:, None] - y[None, :]) / (y2 - y)[None, :]
        xs = x[None, :] + t * (x2 - x)[None, :]             # (H, E)
        # park non-crossing edges at -inf: `xc < -inf` is never a crossing
        # (+inf would count once per non-crossing edge and flip the parity
        # of every scanline where E - crossings is odd — e.g. triangles)
        xs = np.where(crosses, xs, -np.inf)
        xc = np.arange(width) + 0.5                          # (W,)
        # pixel center inside iff an odd number of crossings to its right
        inside = (xc[None, :, None] < xs[:, None, :]).sum(-1) % 2  # (H, W)
        mask |= inside.astype(np.uint8)   # polygons of one instance union
    return mask


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
        bitmaps = [rasterize_polygons(inst, self.height, self.width)
                   for inst in self.masks]
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


def encode_rle(mask: np.ndarray) -> dict:
    """Binary mask → COCO uncompressed RLE (column-major runs, first run
    counts zeros) — the ``segmentation`` format of segm result json
    (pycocotools ``maskUtils.encode`` semantics, uncompressed counts)."""
    m = np.asarray(mask, np.uint8)
    h, w = m.shape
    flat = m.flatten(order="F")
    if len(flat) == 0:
        return dict(size=[h, w], counts=[0])
    change = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], change, [len(flat)]])
    counts = np.diff(bounds).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return dict(size=[int(h), int(w)], counts=counts)


def decode_rle(rle: dict) -> np.ndarray:
    """COCO uncompressed RLE → (H, W) uint8 binary mask."""
    h, w = rle["size"]
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in rle["counts"]:
        c = int(c)
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val = 1 - val
    return flat.reshape((h, w), order="F")


def rle_area(rle: dict) -> int:
    return int(sum(int(c) for c in rle["counts"][1::2]))


def mask_iou(dt_masks: np.ndarray, gt_masks: np.ndarray,
             iscrowd: np.ndarray) -> np.ndarray:
    """Pairwise IoU of binary masks (N, H, W) × (M, H, W); crowd GT uses
    intersection / dt-area (COCO convention, like bbox crowd IoU)."""
    n, m = len(dt_masks), len(gt_masks)
    if n == 0 or m == 0:
        return np.zeros((n, m))
    d = dt_masks.reshape(n, -1).astype(np.float64)
    g = gt_masks.reshape(m, -1).astype(np.float64)
    inter = d @ g.T
    d_area = d.sum(1)[:, None]
    g_area = g.sum(1)[None, :]
    union = np.where(np.asarray(iscrowd, bool)[None, :], d_area,
                     d_area + g_area - inter)
    return inter / np.maximum(union, 1e-10)


def roi_align_np(img: np.ndarray, box, out_h: int, out_w: int) -> np.ndarray:
    """Aligned average RoIAlign of one (H, W) image at one float box —
    mmcv ``roi_align`` semantics (aligned=True, sampling_ratio=0, 'avg'):
    half-pixel offset, adaptive ceil sample grid per bin, border rule
    zero outside [-1, size] and edge-clamped bilinear inside.
    """
    h, w = img.shape
    x1, y1, x2, y2 = [float(v) for v in box]
    sx, sy = x1 - 0.5, y1 - 0.5
    rw, rh = x2 - x1, y2 - y1
    gh = int(np.ceil(rh / out_h))
    gw = int(np.ceil(rw / out_w))
    count = max(gh * gw, 1)
    if gh <= 0 or gw <= 0:
        return np.zeros((out_h, out_w), np.float32)
    bin_h, bin_w = rh / out_h, rw / out_w
    ys = (sy + (np.arange(out_h)[:, None] * bin_h)
          + (np.arange(gh)[None, :] + 0.5) * (bin_h / gh)).reshape(-1)
    xs = (sx + (np.arange(out_w)[:, None] * bin_w)
          + (np.arange(gw)[None, :] + 0.5) * (bin_w / gw)).reshape(-1)

    def _axis(v, size):
        inside = (v >= -1.0) & (v <= size)
        vc = np.clip(v, 0.0, None)
        lo = vc.astype(np.int64)
        hi = np.minimum(lo + 1, size - 1)
        lo = np.minimum(lo, size - 1)
        frac = np.where(lo >= size - 1, 0.0, vc - lo)
        return inside, lo, hi, frac

    iy, ylo, yhi, fy = _axis(ys, h)
    ix, xlo, xhi, fx = _axis(xs, w)
    f = img.astype(np.float32)
    val = ((1 - fy)[:, None] * (1 - fx)[None, :] * f[ylo][:, xlo]
           + (1 - fy)[:, None] * fx[None, :] * f[ylo][:, xhi]
           + fy[:, None] * (1 - fx)[None, :] * f[yhi][:, xlo]
           + fy[:, None] * fx[None, :] * f[yhi][:, xhi])
    val = val * (iy[:, None] & ix[None, :])
    val = val.reshape(out_h, gh, out_w, gw)
    return val.sum(axis=(1, 3)).astype(np.float32) / count


def mask_target(gt_masks: BitmapMasks, proposals: np.ndarray,
                assigned_gt: np.ndarray, mask_size: int = 28) -> np.ndarray:
    """Crop each proposal's assigned GT mask and resize to (S, S) —
    reference ``mmdet/core/mask/mask_target.py`` exactly: proposals clipped
    to the image, aligned avg RoIAlign (sampling_ratio=0) on the float box,
    binarize at 0.5.

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
        x1 = np.clip(x1, 0, gt_masks.width)
        x2 = np.clip(x2, 0, gt_masks.width)
        y1 = np.clip(y1, 0, gt_masks.height)
        y2 = np.clip(y2, 0, gt_masks.height)
        out[i] = roi_align_np(gt_masks.masks[gi], (x1, y1, x2, y2),
                              mask_size, mask_size)
    return (out >= 0.5).astype(np.float32)
