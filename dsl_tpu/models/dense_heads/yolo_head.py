"""YOLOv3 neck + head.

Parity with ``/root/reference/mmdet/models/necks/yolo_neck.py`` +
``dense_heads/yolo_head.py``: the DetectionBlock neck (5-conv squeeze/expand
towers with top-down 1x1+upsample lateral fusion) and the per-scale YOLO
predictor (objectness + class logits + xywh offsets against 3 anchors per
cell). Loss: responsible-cell GridAssigner + YOLOBBoxCoder targets with
config-driven CE/MSE reductions (see ``yolo_loss``). Decode: sigmoid-offset
inside the cell, exp-scaled anchors, objectness×class score into
multiclass NMS.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS, NECKS
from dsl_tpu.core.boxes import bbox_overlaps
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
    # GridAssigner thresholds (reference yolov3 train_cfg)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0
    one_hot_smoother: float = 0.0
    # loss configs (reference head defaults: CE-sigmoid/MSE, mean, lw 1.0;
    # the shipped yolov3 config uses reduction='sum' with xy/wh lw 2.0)
    loss_cls: dict | None = None
    loss_conf: dict | None = None
    loss_xy: dict | None = None
    loss_wh: dict | None = None

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
    """YOLOv3 loss with reference semantics (``yolo_head.py:414-605``):

    - GridAssigner over ALL levels jointly: an anchor is *responsible* when
      any gt center falls in its cell (``single_level_responsible_flags``);
      negatives are anchors whose max IoU (over all gts) <= neg_iou_thr;
      positives are responsible anchors with IoU > pos_iou_thr, plus each
      gt's best responsible anchor(s) (``grid_assigner.py:42-155``);
      anchors above neg_iou_thr that are not positive are IGNORED.
    - Targets via YOLOBBoxCoder.encode: sigmoid-space xy offsets
      (+0.5, clamped to [eps, 1-eps]), log wh ratios
      (``yolo_bbox_coder.py:26-58``).
    - Normalization/weighting is config-driven per component: per-LEVEL
      element mean for ``reduction='mean'`` (mmdet CE/MSE inside per-level
      ``loss_single``, head defaults ``yolo_head.py:65-77``) or a plain sum
      for ``reduction='sum'`` (the shipped yolov3 config, which also sets
      xy/wh ``loss_weight=2.0``) — both torch-oracle pinned.
    """
    nc = head.num_classes
    eps = 1e-6
    b = preds[0].shape[0]

    anchors_lvl, resp_dims, flat_preds, stride_per_anchor = [], [], [], []
    for lvl, pred in enumerate(preds):
        _, h, w, _ = pred.shape
        stride = float(head.strides[lvl])
        anchors = head.anchors[lvl]
        na = len(anchors)
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        cxg, cyg = jnp.meshgrid(gx, gy)
        centers = jnp.stack([cxg, cyg], -1).reshape(-1, 2)     # (HW, 2)
        aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
        ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
        anc = jnp.stack([
            centers[:, None, 0] - aw[None, :] / 2,
            centers[:, None, 1] - ah[None, :] / 2,
            centers[:, None, 0] + aw[None, :] / 2,
            centers[:, None, 1] + ah[None, :] / 2],
            axis=-1).reshape(-1, 4)                            # (HW*A, 4)
        anchors_lvl.append(anc)
        resp_dims.append((h, w, na, stride))
        flat_preds.append(pred.reshape(b, -1, 5 + nc))
        stride_per_anchor.append(
            jnp.full((h * w * na,), stride, jnp.float32))
    all_anchors = jnp.concatenate(anchors_lvl)                 # (A, 4)
    all_strides = jnp.concatenate(stride_per_anchor)           # (A,)
    p = jnp.concatenate(flat_preds, axis=1)                    # (B, A, 5+C)

    def _responsible(gt, gt_valid):
        """(A,) bool: any valid gt center falls in the anchor's cell."""
        cx = (gt[:, 0] + gt[:, 2]) * 0.5
        cy = (gt[:, 1] + gt[:, 3]) * 0.5
        flags = []
        for (h, w, na, stride) in resp_dims:
            gxi = jnp.clip(jnp.floor(cx / stride), 0, w - 1)
            gyi = jnp.clip(jnp.floor(cy / stride), 0, h - 1)
            idx = (gyi * w + gxi).astype(jnp.int32)            # (K,)
            grid = jnp.zeros((h * w,), bool).at[idx].set(
                gt_valid, mode="drop")
            flags.append(jnp.repeat(grid, na))
        return jnp.concatenate(flags)

    def _assign_single(gt, gt_label, gt_valid):
        ious = bbox_overlaps(gt, all_anchors)                  # (K, A)
        # step 2 uses raw IoUs over valid gts (IoU 0 when none are valid,
        # matching the reference's num_gts==0 → everything-negative path)
        max_iou = jnp.max(jnp.where(gt_valid[:, None], ious, 0.0), axis=0)
        neg = max_iou <= head.neg_iou_thr
        resp = _responsible(gt, gt_valid)                      # (A,)
        iou_r = jnp.where(resp[None, :] & gt_valid[:, None], ious, -1.0)
        max_r = jnp.max(iou_r, axis=0)
        arg_r = jnp.argmax(iou_r, axis=0)
        pos3 = (max_r > head.pos_iou_thr) & resp
        assigned = jnp.where(pos3, arg_r, -1)
        # step 4 (overrides step 3): each gt claims its best responsible
        # anchor(s) when iou > min_pos_iou (gt_max_assign_all=True ties);
        # the reference loops gts in order, so on conflict the LAST gt wins
        gt_max = jnp.max(iou_r, axis=1)                        # (K,)
        is_best = (iou_r == gt_max[:, None]) & resp[None, :] & \
            (gt_max[:, None] > head.min_pos_iou) & gt_valid[:, None]
        forced = jnp.any(is_best, axis=0)
        k = is_best.shape[0]
        forced_gt = k - 1 - jnp.argmax(is_best[::-1], axis=0)
        assigned = jnp.where(forced, forced_gt, assigned)
        return assigned, neg

    assigned, neg_map = jax.vmap(_assign_single)(
        batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"])
    pos = assigned >= 0
    pos_f = pos.astype(jnp.float32)                            # (B, A)
    neg_f = jnp.clip(neg_map.astype(jnp.float32) + pos_f, 0, 1)

    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
    gl = jnp.take_along_axis(batch["gt_labels"],
                             jnp.maximum(assigned, 0), axis=1)
    # YOLOBBoxCoder.encode
    acx = (all_anchors[:, 0] + all_anchors[:, 2]) * 0.5
    acy = (all_anchors[:, 1] + all_anchors[:, 3]) * 0.5
    aw = all_anchors[:, 2] - all_anchors[:, 0]
    ah = all_anchors[:, 3] - all_anchors[:, 1]
    gcx = (gt[..., 0] + gt[..., 2]) * 0.5
    gcy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    tx = jnp.clip((gcx - acx[None]) / all_strides[None] + 0.5,
                  eps, 1 - eps)
    ty = jnp.clip((gcy - acy[None]) / all_strides[None] + 0.5,
                  eps, 1 - eps)
    tw = jnp.log(jnp.maximum(gw / aw[None], eps))
    th = jnp.log(jnp.maximum(gh / ah[None], eps))
    s = float(head.one_hot_smoother)
    onehot = jax.nn.one_hot(jnp.clip(gl, 0, nc - 1), nc)
    onehot = onehot * (1.0 - s) + s / nc

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    n_dev = _psum(jnp.ones(())) if axis_name else 1.0

    # per-level element-mean weights (loss_single reduces per level)
    lvl_sizes = [h * w * na for (h, w, na, _) in resp_dims]
    inv_mean = jnp.concatenate([
        jnp.full((n,), 1.0 / (b * n), jnp.float32) for n in lvl_sizes])

    def _reduce(elem, cfg, default_type, chans):
        """elem: (B, A) per-anchor loss already summed over channels."""
        cfg = dict(cfg or {})
        typ = cfg.get("type", default_type)
        if typ != default_type or (typ == "CrossEntropyLoss"
                                   and not cfg.get("use_sigmoid", True)):
            raise NotImplementedError(
                f"yolo_loss supports only {default_type}"
                f"{' (use_sigmoid)' if default_type != 'MSELoss' else ''},"
                f" got {cfg}")
        lw = float(cfg.get("loss_weight", 1.0))
        red = cfg.get("reduction", "mean")
        if red == "sum":
            return lw * _psum(jnp.sum(elem))
        if red == "mean":
            return lw * _psum(jnp.sum(elem * inv_mean[None])) / (
                chans * n_dev)
        raise NotImplementedError(f"reduction {red!r}")

    bce = lambda logit, t: (jnp.maximum(logit, 0) - logit * t
                            + jnp.log1p(jnp.exp(-jnp.abs(logit))))
    loss_cls = _reduce(
        jnp.sum(bce(p[..., 5:], onehot), -1) * pos_f,
        head.loss_cls, "CrossEntropyLoss", nc)
    loss_conf = _reduce(bce(p[..., 4], pos_f) * neg_f,
                        head.loss_conf, "CrossEntropyLoss", 1)
    loss_xy = _reduce((bce(p[..., 0], tx) + bce(p[..., 1], ty)) * pos_f,
                      head.loss_xy, "CrossEntropyLoss", 2)
    loss_wh = _reduce(
        ((p[..., 2] - tw) ** 2 + (p[..., 3] - th) ** 2) * pos_f,
        head.loss_wh, "MSELoss", 2)
    return dict(loss_cls=loss_cls, loss_conf=loss_conf, loss_xy=loss_xy,
                loss_wh=loss_wh)


def yolo_get_bboxes(head: YOLOV3Head, preds, img_shapes=None,
                    scale_factors=None, nms_pre=1000, score_thr=0.05,
                    iou_threshold=0.45, max_per_img=100,
                    conf_thr: float = 0.005):
    nc = head.num_classes
    b = preds[0].shape[0]
    boxes_all, scores_all, conf_all = [], [], []
    for lvl, pred in enumerate(preds):
        boxes, obj, cls = _yolo_grid_boxes(pred, head.anchors[lvl],
                                           head.strides[lvl], nc)
        boxes = boxes.reshape(b, -1, 4)
        scores = jax.nn.sigmoid(cls).reshape(b, -1, nc)
        conf = jax.nn.sigmoid(obj).reshape(b, -1)
        k = min(nms_pre, scores.shape[1])
        # reference yolo_head.py:300-320: nms_pre ranks by OBJECTNESS alone
        _, top = jax.lax.top_k(conf, k)
        take = lambda t: jnp.take_along_axis(
            t, top.reshape(b, k, *(1,) * (t.ndim - 2)), axis=1)
        boxes, scores = take(boxes), take(scores)
        conf = jnp.take_along_axis(conf, top, axis=1)
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
        conf_all.append(conf)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    confs = jnp.concatenate(conf_all, axis=1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc, cf):
        # reference yolo_head.py:383-402: conf_thr filters points by raw
        # objectness; score_thr applies to RAW sigmoid(cls); objectness
        # multiplies as score_factors inside multiclass_nms
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img,
                              valid=cf >= conf_thr, score_factors=cf)

    return jax.vmap(_single)(boxes, scores, confs)
