"""YOLOv3 neck + head.

Parity with ``/root/reference/mmdet/models/necks/yolo_neck.py`` +
``dense_heads/yolo_head.py``: the DetectionBlock neck (5-conv squeeze/expand
towers with top-down 1x1+upsample lateral fusion) and the per-scale YOLO
predictor (objectness + class logits + xywh offsets against 3 anchors per
cell). Loss: BCE objectness with MaxIoU-assigned anchors, BCE classes, MSE
on xy-offset/wh-log targets. Decode: sigmoid-offset inside the cell,
exp-scaled anchors, objectness×class score into multiclass NMS.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS, NECKS
from dsl_tpu.core.assigners import max_iou_assign
from dsl_tpu.core import losses as L
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import make_norm, normal_init

# COCO-standard YOLOv3 anchors per output level (large→small stride order
# follows the neck outputs: stride 32, 16, 8)
YOLO_ANCHORS = (
    ((116, 90), (156, 198), (373, 326)),
    ((30, 61), (62, 45), (59, 119)),
    ((10, 13), (16, 30), (33, 23)),
)
YOLO_STRIDES = (32, 16, 8)


def _cbl(x, features, kernel, norm_cfg, name):
    pad = (kernel - 1) // 2
    x = nn.Conv(features, (kernel, kernel), padding=((pad, pad), (pad, pad)),
                use_bias=False, kernel_init=nn.initializers.he_normal(),
                name=f"{name}_conv")(x)
    x = make_norm(norm_cfg, name=f"{name}_bn")(x)
    return nn.leaky_relu(x, 0.1)


@NECKS.register(name="YOLOV3Neck")
class YOLOV3Neck(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024)
    out_channels: Sequence[int] = (128, 256, 512)
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, feats):
        # feats: (C3, C4, C5) small→large stride; process top-down
        c3, c4, c5 = feats
        outs = []
        x = c5
        lateral = None
        for i, (src, oc) in enumerate(((c5, 512), (c4, 256), (c3, 128))):
            if lateral is not None:
                lat = _cbl(lateral, oc, 1, self.norm_cfg, f"lateral{i}")
                lat = jnp.repeat(jnp.repeat(lat, 2, axis=1), 2, axis=2)
                lat = lat[:, :src.shape[1], :src.shape[2], :]
                x = jnp.concatenate([lat, src], axis=-1)
            else:
                x = src
            # DetectionBlock: 5 alternating 1x1/3x3 convs
            for j, (f, k) in enumerate(((oc, 1), (oc * 2, 3), (oc, 1),
                                        (oc * 2, 3), (oc, 1))):
                x = _cbl(x, f, k, self.norm_cfg, f"det{i}_{j}")
            outs.append(x)
            lateral = x
        return tuple(outs)   # strides (32, 16, 8)


@HEADS.register(name="YOLOV3Head")
class YOLOV3Head(nn.Module):
    num_classes: int = 80
    in_channels: Sequence[int] = (512, 256, 128)
    strides: Sequence[int] = YOLO_STRIDES
    anchors: Sequence = YOLO_ANCHORS
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, feats, training: bool = False):
        preds = []
        for i, x in enumerate(feats):
            na = len(self.anchors[i])
            x = _cbl(x, self.in_channels[i] * 2, 3, self.norm_cfg,
                     f"pred{i}_conv")
            p = nn.Conv(na * (5 + self.num_classes), (1, 1), padding="VALID",
                        kernel_init=normal_init(0.01),
                        name=f"pred{i}_out")(x)
            preds.append(p)
        return tuple(preds)


def _yolo_grid_boxes(pred, anchors, stride, num_classes):
    """Decode raw predictions: (B, H, W, A*(5+C)) → boxes/obj/cls."""
    b, h, w, _ = pred.shape
    na = len(anchors)
    p = pred.reshape(b, h, w, na, 5 + num_classes)
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    cx = (jax.nn.sigmoid(p[..., 0]) + gx) * stride
    cy = (jax.nn.sigmoid(p[..., 1]) + gy) * stride
    aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
    ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
    bw = jnp.exp(jnp.clip(p[..., 2], -10, 8)) * aw
    bh = jnp.exp(jnp.clip(p[..., 3], -10, 8)) * ah
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                      axis=-1)
    obj = p[..., 4]
    cls = p[..., 5:]
    return boxes, obj, cls


def yolo_loss(head: YOLOV3Head, preds, batch, axis_name: str | None = None):
    nc = head.num_classes
    losses = dict(loss_obj=0.0, loss_cls=0.0, loss_xy=0.0, loss_wh=0.0)
    total_pos = 0.0
    for lvl, pred in enumerate(preds):
        b, h, w, _ = pred.shape
        stride = head.strides[lvl]
        anchors = head.anchors[lvl]
        na = len(anchors)
        # anchor boxes centered at each cell
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        cxg, cyg = jnp.meshgrid(gx, gy)
        centers = jnp.stack([cxg, cyg], -1).reshape(-1, 2)   # (HW, 2)
        aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
        ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
        anc = jnp.stack([
            centers[:, None, 0] - aw[None, :] / 2,
            centers[:, None, 1] - ah[None, :] / 2,
            centers[:, None, 0] + aw[None, :] / 2,
            centers[:, None, 1] + ah[None, :] / 2], axis=-1).reshape(-1, 4)

        labels, assigned, weights, _ = max_iou_assign(
            anc, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
            pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=1e-3,
            num_classes=nc)                                  # (B, HW*A)
        pos = labels < nc
        pos_f = pos.astype(jnp.float32)
        total_pos = total_pos + jnp.sum(pos_f)

        p = pred.reshape(b, -1, 5 + nc)                      # (B, HW*A)
        gt = jnp.take_along_axis(
            batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
        # targets in the yolo parameterization
        gcx = (gt[..., 0] + gt[..., 2]) / 2
        gcy = (gt[..., 1] + gt[..., 3]) / 2
        gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1.0)
        gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1.0)
        cell = jnp.tile(centers[:, None, :], (1, na, 1)).reshape(-1, 2)
        tx = jnp.clip((gcx - (cell[None, :, 0] - stride * 0.5)) / stride,
                      1e-3, 1 - 1e-3)
        ty = jnp.clip((gcy - (cell[None, :, 1] - stride * 0.5)) / stride,
                      1e-3, 1 - 1e-3)
        anc_w = jnp.tile(aw[None, :], (h * w, 1)).reshape(-1)
        anc_h = jnp.tile(ah[None, :], (h * w, 1)).reshape(-1)
        tw = jnp.log(gw / anc_w[None, :])
        th = jnp.log(gh / anc_h[None, :])

        losses["loss_obj"] = losses["loss_obj"] + L.binary_cross_entropy(
            p[..., 4], pos_f, weight=weights, reduction="sum")
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, nc - 1), nc)
        cls_bce = (jnp.maximum(p[..., 5:], 0) - p[..., 5:] * onehot
                   + jnp.log1p(jnp.exp(-jnp.abs(p[..., 5:]))))
        losses["loss_cls"] = losses["loss_cls"] + jnp.sum(
            cls_bce * pos_f[..., None])
        xy_bce = (L.binary_cross_entropy(p[..., 0], tx, reduction="none")
                  + L.binary_cross_entropy(p[..., 1], ty, reduction="none"))
        losses["loss_xy"] = losses["loss_xy"] + jnp.sum(xy_bce * pos_f)
        wh_mse = (p[..., 2] - tw) ** 2 + (p[..., 3] - th) ** 2
        losses["loss_wh"] = losses["loss_wh"] + jnp.sum(wh_mse * pos_f) * 0.5

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    denom = jnp.maximum(_psum(total_pos), 1.0)
    return {k: _psum(v) / denom if k != "loss_obj" else _psum(v) / denom
            for k, v in losses.items()}


def yolo_get_bboxes(head: YOLOV3Head, preds, img_shapes=None,
                    scale_factors=None, nms_pre=1000, score_thr=0.05,
                    iou_threshold=0.45, max_per_img=100):
    nc = head.num_classes
    b = preds[0].shape[0]
    boxes_all, scores_all = [], []
    for lvl, pred in enumerate(preds):
        boxes, obj, cls = _yolo_grid_boxes(pred, head.anchors[lvl],
                                           head.strides[lvl], nc)
        boxes = boxes.reshape(b, -1, 4)
        scores = (jax.nn.sigmoid(obj)[..., None]
                  * jax.nn.sigmoid(cls)).reshape(b, -1, nc)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, top = jax.lax.top_k(rank, k)
        take = lambda t: jnp.take_along_axis(
            t, top.reshape(b, k, *(1,) * (t.ndim - 2)), axis=1)
        boxes, scores = take(boxes), take(scores)
        if img_shapes is not None:
            xlim = img_shapes[:, None, 1:2]
            ylim = img_shapes[:, None, 0:1]
            boxes = jnp.concatenate(
                [jnp.clip(boxes[..., 0:1], 0, xlim),
                 jnp.clip(boxes[..., 1:2], 0, ylim),
                 jnp.clip(boxes[..., 2:3], 0, xlim),
                 jnp.clip(boxes[..., 3:4], 0, ylim)], axis=-1)
        boxes_all.append(boxes)
        scores_all.append(scores)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc):
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img)

    return jax.vmap(_single)(boxes, scores)
