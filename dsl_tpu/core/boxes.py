"""Box math in pure JAX: overlaps, distance/delta coding, clipping.

Semantics match the reference implementations:
- IoU/GIoU/IoF: ``/root/reference/mmdet/core/bbox/iou_calculators/iou2d_calculator.py:66-260``
- distance2bbox / bbox2distance: ``mmdet/core/bbox/transforms.py``
- delta coding: ``mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:87-271``

All functions are shape-polymorphic pure jnp — everything jit/vmap-cleanly and
with static shapes (padding boxes with zeros gives 0 area and 0 overlap, so
masked rows are harmless).

Boxes are ``(x1, y1, x2, y2)`` float arrays, corner-exclusive like mmdet with
``coordinate_offset=0`` (area = (x2-x1)*(y2-y1)).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def bbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) boxes."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def bbox_overlaps(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                  mode: str = "iou", is_aligned: bool = False,
                  eps: float = EPS) -> jnp.ndarray:
    """Pairwise (or aligned) overlaps.

    Args:
      boxes1: (..., M, 4); boxes2: (..., N, 4) (or (..., M, 4) when aligned).
      mode: 'iou' | 'iof' (intersection over first-box area) | 'giou'.

    Returns (..., M, N) (or (..., M) aligned).
    """
    assert mode in ("iou", "iof", "giou"), mode
    area1 = bbox_area(boxes1)
    area2 = bbox_area(boxes2)

    if is_aligned:
        lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
        rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
        wh = jnp.maximum(rb - lt, 0.0)
        overlap = wh[..., 0] * wh[..., 1]
        if mode == "iof":
            union = area1
        else:
            union = area1 + area2 - overlap
        if mode == "giou":
            enc_lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
            enc_rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    else:
        lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
        rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
        wh = jnp.maximum(rb - lt, 0.0)
        overlap = wh[..., 0] * wh[..., 1]
        if mode == "iof":
            union = area1[..., :, None] + jnp.zeros_like(area2[..., None, :])
        else:
            union = area1[..., :, None] + area2[..., None, :] - overlap
        if mode == "giou":
            enc_lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
            enc_rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])

    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ("iou", "iof"):
        return ious
    enc_wh = jnp.maximum(enc_rb - enc_lt, 0.0)
    enc_area = jnp.maximum(enc_wh[..., 0] * enc_wh[..., 1], eps)
    return ious - (enc_area - union) / enc_area


def distance2bbox(points: jnp.ndarray, distances: jnp.ndarray,
                  max_shape: tuple[int, int] | None = None) -> jnp.ndarray:
    """Decode (l, t, r, b) distances at (x, y) points into boxes."""
    x1 = points[..., 0] - distances[..., 0]
    y1 = points[..., 1] - distances[..., 1]
    x2 = points[..., 0] + distances[..., 2]
    y2 = points[..., 1] + distances[..., 3]
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        boxes = clip_boxes(boxes, max_shape)
    return boxes


def bbox2distance(points: jnp.ndarray, bbox: jnp.ndarray,
                  max_dis: float | None = None, eps: float = 0.1) -> jnp.ndarray:
    """Encode boxes as (l, t, r, b) distances from points."""
    left = points[..., 0] - bbox[..., 0]
    top = points[..., 1] - bbox[..., 1]
    right = bbox[..., 2] - points[..., 0]
    bottom = bbox[..., 3] - points[..., 1]
    d = jnp.stack([left, top, right, bottom], axis=-1)
    if max_dis is not None:
        d = jnp.clip(d, 0, max_dis - eps)
    return d


def clip_boxes(boxes: jnp.ndarray, max_shape: tuple[int, int]) -> jnp.ndarray:
    """Clip boxes to image (H, W)."""
    h, w = max_shape[0], max_shape[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
               means=(0.0, 0.0, 0.0, 0.0),
               stds=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode gt boxes relative to proposals as (dx, dy, dw, dh) deltas."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    dx = (gx - px) / jnp.maximum(pw, EPS)
    dy = (gy - py) / jnp.maximum(ph, EPS)
    dw = jnp.log(jnp.maximum(gw, EPS) / jnp.maximum(pw, EPS))
    dh = jnp.log(jnp.maximum(gh, EPS) / jnp.maximum(ph, EPS))
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
               means=(0.0, 0.0, 0.0, 0.0),
               stds=(1.0, 1.0, 1.0, 1.0),
               max_shape: tuple[int, int] | None = None,
               wh_ratio_clip: float = 16.0 / 1000.0,
               add_ctr_clamp: bool = False,
               ctr_clamp: float = 32.0) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas on rois into boxes.

    ``add_ctr_clamp`` is the YOLOF variant
    (``delta_xywh_bbox_coder.py:139-146``): the center shift in pixels is
    clamped to ±``ctr_clamp`` and dw/dh only clamped from above."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    dx_width = pw * dx
    dy_height = ph * dy
    if add_ctr_clamp:
        dx_width = jnp.clip(dx_width, -ctr_clamp, ctr_clamp)
        dy_height = jnp.clip(dy_height, -ctr_clamp, ctr_clamp)
        dw = jnp.minimum(dw, max_ratio)
        dh = jnp.minimum(dh, max_ratio)
    else:
        dw = jnp.clip(dw, -max_ratio, max_ratio)
        dh = jnp.clip(dh, -max_ratio, max_ratio)
    gx = px + dx_width
    gy = py + dy_height
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    boxes = jnp.stack(
        [gx - gw * 0.5, gy - gh * 0.5, gx + gw * 0.5, gy + gh * 0.5], axis=-1)
    if max_shape is not None:
        boxes = clip_boxes(boxes, max_shape)
    return boxes


def resolve_delta_coder(cfg, default_means=(0.0, 0.0, 0.0, 0.0),
                        default_stds=(1.0, 1.0, 1.0, 1.0)):
    """``bbox_coder`` cfg dict -> ``(encode_fn, decode_fn, means, stds)``.
    Supports the stock DeltaXYWHBBoxCoder (default) and the V1.x legacy coder
    used by ``configs/legacy_1.x`` (``legacy_delta_xywh_bbox_coder.py``);
    unsupported types raise. ``target_means/stds`` inside the cfg win over
    the head-attribute defaults."""
    c = dict(cfg or {})
    t = c.get("type", "DeltaXYWHBBoxCoder")
    means = tuple(c.get("target_means", default_means))
    stds = tuple(c.get("target_stds", default_stds))
    if t == "DeltaXYWHBBoxCoder":
        return bbox2delta, delta2bbox, means, stds
    if t == "LegacyDeltaXYWHBBoxCoder":
        return legacy_bbox2delta, legacy_delta2bbox, means, stds
    raise ValueError(f"unsupported delta bbox_coder type: {t}")


def bbox_center(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [(boxes[..., 0] + boxes[..., 2]) * 0.5,
         (boxes[..., 1] + boxes[..., 3]) * 0.5], axis=-1)


def bbox_rescale(boxes: jnp.ndarray, scale_factor) -> jnp.ndarray:
    """Scale boxes by per-coordinate scale factor (sx, sy, sx, sy) or scalar."""
    scale = jnp.asarray(scale_factor, boxes.dtype)
    if scale.ndim == 1 and scale.shape[-1] == 4:
        return boxes * scale
    return boxes * scale


def bbox_flip(boxes: jnp.ndarray, img_shape: tuple[int, int],
              direction: str = "horizontal") -> jnp.ndarray:
    """Flip boxes inside an image of (H, W)."""
    h, w = img_shape
    if direction == "horizontal":
        x1 = w - boxes[..., 2]
        x2 = w - boxes[..., 0]
        return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)
    elif direction == "vertical":
        y1 = h - boxes[..., 3]
        y2 = h - boxes[..., 1]
        return jnp.stack([boxes[..., 0], y1, boxes[..., 2], y2], axis=-1)
    raise ValueError(direction)


def bboxes2tblr(priors: jnp.ndarray, gts: jnp.ndarray,
                normalizer=4.0, normalize_by_wh: bool = True) -> jnp.ndarray:
    """Encode gt boxes as (top, bottom, left, right) distances from the
    prior center, wh-normalized (``mmdet/core/bbox/coder/tblr_bbox_coder.py``
    bboxes2tblr)."""
    cx = (priors[..., 0] + priors[..., 2]) / 2
    cy = (priors[..., 1] + priors[..., 3]) / 2
    top = cy - gts[..., 1]
    bottom = gts[..., 3] - cy
    left = cx - gts[..., 0]
    right = gts[..., 2] - cx
    loc = jnp.stack([top, bottom, left, right], axis=-1)
    if normalize_by_wh:
        w = priors[..., 2] - priors[..., 0]
        h = priors[..., 3] - priors[..., 1]
        loc = jnp.concatenate(
            [loc[..., :2] / jnp.maximum(h, EPS)[..., None],
             loc[..., 2:] / jnp.maximum(w, EPS)[..., None]], axis=-1)
    return loc / jnp.asarray(normalizer)


def tblr2bboxes(priors: jnp.ndarray, tblr: jnp.ndarray, normalizer=4.0,
                normalize_by_wh: bool = True,
                max_shape: tuple[int, int] | None = None) -> jnp.ndarray:
    """Decode (t, b, l, r) predictions back to xyxy (tblr2bboxes)."""
    loc = tblr * jnp.asarray(normalizer)
    cx = (priors[..., 0] + priors[..., 2]) / 2
    cy = (priors[..., 1] + priors[..., 3]) / 2
    if normalize_by_wh:
        w = priors[..., 2] - priors[..., 0]
        h = priors[..., 3] - priors[..., 1]
        loc = jnp.concatenate([loc[..., :2] * h[..., None],
                               loc[..., 2:] * w[..., None]], axis=-1)
    top, bottom, left, right = (loc[..., 0], loc[..., 1], loc[..., 2],
                                loc[..., 3])
    boxes = jnp.stack([cx - left, cy - top, cx + right, cy + bottom],
                      axis=-1)
    if max_shape is not None:
        boxes = clip_boxes(boxes, max_shape)
    return boxes


def yolo_encode(bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray, stride,
                eps: float = 1e-6) -> jnp.ndarray:
    """YOLOBBoxCoder.encode (``coder/yolo_bbox_coder.py:26-58``):
    (tx, ty) = center offset / stride + 0.5 clamped to (eps, 1-eps);
    (tw, th) = log(gt_wh / anchor_wh)."""
    xc = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    yc = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    w = bboxes[..., 2] - bboxes[..., 0]
    h = bboxes[..., 3] - bboxes[..., 1]
    gxc = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
    gyc = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
    gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
    gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
    tw = jnp.log(jnp.maximum(gw / w, eps))
    th = jnp.log(jnp.maximum(gh / h, eps))
    tx = jnp.clip((gxc - xc) / stride + 0.5, eps, 1 - eps)
    ty = jnp.clip((gyc - yc) / stride + 0.5, eps, 1 - eps)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def yolo_decode(bboxes: jnp.ndarray, pred: jnp.ndarray,
                stride) -> jnp.ndarray:
    """YOLOBBoxCoder.decode (``yolo_bbox_coder.py:60-90``)."""
    xc = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    yc = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    w = bboxes[..., 2] - bboxes[..., 0]
    h = bboxes[..., 3] - bboxes[..., 1]
    pxc = (pred[..., 0] - 0.5) * stride + xc
    pyc = (pred[..., 1] - 0.5) * stride + yc
    pw = jnp.exp(pred[..., 2]) * w
    ph = jnp.exp(pred[..., 3]) * h
    return jnp.stack([pxc - pw / 2, pyc - ph / 2,
                      pxc + pw / 2, pyc + ph / 2], axis=-1)


def legacy_bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
                      means=(0., 0., 0., 0.),
                      stds=(1., 1., 1., 1.)) -> jnp.ndarray:
    """MMDet V1.x delta encoding (``legacy_delta_xywh_bbox_coder.py:103-160``):
    width/height use the +1 pixel convention."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                        jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def legacy_delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
                      means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
                      max_shape=None,
                      wh_ratio_clip: float = 16 / 1000) -> jnp.ndarray:
    """MMDet V1.x delta decoding (``legacy_delta_xywh_bbox_coder.py:130-216``):
    +1 w/h convention and a trailing -0.5 on the br corner."""
    import numpy as np

    k = deltas.shape[-1] // 4
    d = deltas.reshape(deltas.shape[:-1] + (k, 4))
    means = jnp.asarray(means, d.dtype)
    stds = jnp.asarray(stds, d.dtype)
    d = d * stds + means
    max_ratio = float(np.abs(np.log(wh_ratio_clip)))
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    # the reference deliberately drops the true-legacy ±0.5 corner shift
    # (``legacy_delta_xywh_bbox_coder.py:200-208``)
    out = jnp.stack([gx - gw * 0.5, gy - gh * 0.5,
                     gx + gw * 0.5, gy + gh * 0.5], axis=-1)
    if max_shape is not None:
        out = jnp.stack([jnp.clip(out[..., 0], 0, max_shape[1] - 1),
                         jnp.clip(out[..., 1], 0, max_shape[0] - 1),
                         jnp.clip(out[..., 2], 0, max_shape[1] - 1),
                         jnp.clip(out[..., 3], 0, max_shape[0] - 1)],
                        axis=-1)
    return out.reshape(deltas.shape)


def pseudo_encode(bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray) -> jnp.ndarray:
    """PseudoBBoxCoder (``pseudo_bbox_coder.py``): identity."""
    return gt_bboxes


def pseudo_decode(bboxes: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    return pred
