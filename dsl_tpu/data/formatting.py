"""Fixed-shape batch building — the TPU replacement for DataContainer collate.

The reference collates variable-sized tensors into DataContainers and pads to
the batch max (``mmdet/datasets/builder.py`` + mmcv collate;
``_merge_data2one_batch`` right/bottom pads two sub-batches to a common H/W,
``builder.py:236-267``). XLA needs *static* shapes, so here every sample is
placed into a fixed canvas bucket and GT is K-padded with validity masks:

  images       (B, H, W, 3) float32, right/bottom zero-padded
  gt_bboxes    (B, K, 4)   gt_labels (B, K)   gt_valid (B, K)
  ignore_bboxes(B, Ki, 4)  ignore_valid (B, Ki)
  img_shapes   (B, 2)      scale_factors (B, 4)   source_weight (B,)

The scale-invariant extra input (reference
``semi_epoch_based_runner.py:186-204``: half-res copy of the last image with
halved gt, zero-padded) becomes one more canvas slot + ``si_pair`` indices.
"""

from __future__ import annotations

import numpy as np
import cv2

DEFAULT_CANVAS = (800, 1344)     # Resize(1333, 800) + pad_to_divisor 32
DEFAULT_MAX_GT = 100
DEFAULT_MAX_IGNORE = 60


def select_canvas(shapes, base_hw=DEFAULT_CANVAS) -> tuple[int, int]:
    """Orientation-aware canvas for a batch of (h, w) image shapes.

    The reference pads each batch to its max H/W (variable shapes); XLA needs
    static ones. With ``Resize(keep_ratio)`` a landscape image fits
    (short, long) and a portrait one (long, short), so a batch maps to one of
    three static canvases: landscape, portrait, or (mixed orientations)
    square — at most 3 compiled variants of the train step.
    """
    short, long_ = min(base_hw), max(base_hw)
    has_land = any(w >= h for h, w in shapes)
    has_port = any(h > w for h, w in shapes)
    if has_land and has_port:
        return (long_, long_)
    if has_port:
        return (long_, short)
    return (short, long_)


def format_sample(results: dict, canvas_hw=DEFAULT_CANVAS,
                  max_gt: int = DEFAULT_MAX_GT,
                  max_ignore: int = DEFAULT_MAX_IGNORE) -> dict:
    """One pipeline output -> fixed-shape arrays (host numpy)."""
    img = results["img"]
    ch, cw = canvas_hw
    h, w = img.shape[:2]
    assert h <= ch and w <= cw, f"image {h}x{w} exceeds canvas {ch}x{cw}"
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:h, :w] = img

    def _pad_boxes(boxes, labels, k):
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)[:k]
        n = len(boxes)
        out_b = np.zeros((k, 4), np.float32)
        out_b[:n] = boxes
        out_v = np.zeros((k,), bool)
        out_v[:n] = True
        out_l = np.zeros((k,), np.int32)
        if labels is not None:
            labels = np.asarray(labels, np.int32).reshape(-1)[:k]
            out_l[:n] = labels
        return out_b, out_l, out_v

    gt_b, gt_l, gt_v = _pad_boxes(
        results.get("gt_bboxes", np.zeros((0, 4))),
        results.get("gt_labels", np.zeros((0,))), max_gt)
    ig_b, _, ig_v = _pad_boxes(
        results.get("gt_bboxes_ignore", np.zeros((0, 4))), None, max_ignore)

    sf = np.asarray(results.get("scale_factor", np.ones(4)), np.float32)
    out = dict(
        images=canvas,
        gt_bboxes=gt_b, gt_labels=gt_l, gt_valid=gt_v,
        ignore_bboxes=ig_b, ignore_valid=ig_v,
        img_shapes=np.asarray([h, w], np.float32),
        scale_factors=sf.reshape(4),
        meta=results.get("img_metas", {}),
    )
    if "gt_masks" in results:
        # Per-GT normalized mask crops (K, M, M): each instance mask cropped
        # to its gt box and resized once on host; the device resamples any
        # roi's mask target from these under jit (mask_head.py). uint8 keeps
        # host->device bandwidth low.
        from dsl_tpu.models.roi_heads.mask_head import (
            GT_MASK_CROP_SIZE, gt_mask_crop)

        masks = results["gt_masks"]
        if hasattr(masks, "to_bitmap"):
            masks = masks.to_bitmap()
        m = GT_MASK_CROP_SIZE
        crops = np.zeros((max_gt, m, m), np.uint8)
        areas = np.zeros((max_gt,), np.float32)
        n = min(len(masks), max_gt)
        for i in range(n):
            crops[i] = (gt_mask_crop(masks.masks[i], gt_b[i], m)
                        >= 0.5).astype(np.uint8)
            # full-instance pixel area (BitmapMasks.areas) — the MaskIoU
            # head's area-ratio denominator (maskiou_head.py:147-170)
            areas[i] = float(masks.masks[i].sum())
        out["gt_mask_crops"] = crops
        out["gt_mask_areas"] = areas
    return out


def build_batch(samples: list[dict], source_weights=None,
                scale_invariant: bool = False, n_shards: int = 1) -> dict:
    """Stack formatted samples; optionally append half-res SI copies.

    With ``n_shards > 1`` the sample list is treated as ``n_shards``
    contiguous per-device groups (matching a leading-axis 'data' sharding);
    each group gets its own SI copy of its last image so every device shard
    has identical size, and ``si_pair`` carries index *arrays*.
    """
    if source_weights is None:
        sw = [1.0] * len(samples)
    else:
        sw = list(source_weights)
    si_full, si_half = [], []
    if scale_invariant:
        assert len(samples) % n_shards == 0
        per = len(samples) // n_shards
        new_samples, new_sw = [], []
        for s in range(n_shards):
            group = samples[s * per:(s + 1) * per]
            gw = sw[s * per:(s + 1) * per]
            base = len(new_samples)
            new_samples.extend(group + [_half_res_copy(group[-1])])
            new_sw.extend(gw + [gw[-1]])
            si_full.append(base + per - 1)
            si_half.append(base + per)
        samples, sw = new_samples, new_sw
    batch = {}
    keys = [k for k in samples[0] if k != "meta"]
    for k in keys:
        batch[k] = np.stack([s[k] for s in samples])
    batch["meta"] = [s.get("meta", {}) for s in samples]
    batch["source_weight"] = np.asarray(sw, np.float32)
    if scale_invariant:
        batch["si_pair"] = dict(full=np.asarray(si_full, np.int32),
                                half=np.asarray(si_half, np.int32))
    return batch


def _half_res_copy(sample: dict) -> dict:
    """Half-resolution copy of a formatted sample (same canvas, top-left).

    Mirrors the reference SI-append block
    (``semi_epoch_based_runner.py:186-204``) exactly:
    - the WHOLE padded canvas is bilinearly resized to (H//2, W//2) and
      placed top-left (``F.interpolate`` on the padded tensor, not just the
      valid region — ``:196-199``);
    - ``gt_bboxes`` are halved (``:201``);
    - ``gt_bboxes_ignore`` are halved too (``:203-204``) — the half image's
      ignore-region cls masking must track the shrunken content;
    - ``img_shape`` is halved with int truncation (``:188-189``) and
      ``scale_factor`` exactly (``:190``).
    Oracled against the reference's own executed code in
    ``tests/test_torch_oracle_si_append.py``.
    """
    img = sample["images"]
    ch, cw = img.shape[:2]
    small = cv2.resize(img, (max(cw // 2, 1), max(ch // 2, 1)),
                       interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros_like(img)
    canvas[: small.shape[0], : small.shape[1]] = small
    out = dict(sample)
    out["images"] = canvas
    out["gt_bboxes"] = sample["gt_bboxes"] * 0.5
    out["ignore_bboxes"] = sample["ignore_bboxes"] * 0.5
    out["img_shapes"] = np.floor(sample["img_shapes"] * 0.5)
    out["scale_factors"] = sample["scale_factors"] * 0.5
    return out
