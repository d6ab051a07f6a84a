"""GFL head: Generalized Focal Loss (QFL + DFL + integral regression).

Parity with ``/root/reference/mmdet/models/dense_heads/gfl_head.py``:
ATSS-style single-anchor towers with GN, classification trained with
Quality Focal Loss (target = IoU of the predicted box), regression as a
discrete distribution over ``reg_max + 1`` bins per side decoded by the
softmax integral (×stride), trained with DFL + GIoU. Dense fixed-shape.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.assigners import atss_assign
from dsl_tpu.core.boxes import bbox_overlaps, bbox2distance, distance2bbox
from dsl_tpu.core import losses as L
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import Scale, bias_init_with_prob, normal_init


@HEADS.register
class GFLHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    reg_max: int = 16
    octave_base_scale: int = 8
    topk: int = 9
    anchor_generator: dict | None = None
    loss_cls: dict | None = None
    loss_bbox: dict | None = None
    loss_dfl: dict | None = None

    def make_anchor_generator(self) -> AnchorGenerator:
        cfg = dict(self.anchor_generator or {})
        return AnchorGenerator(
            strides=cfg.get("strides", list(self.strides)),
            ratios=cfg.get("ratios", [1.0]),
            octave_base_scale=cfg.get("octave_base_scale",
                                      self.octave_base_scale),
            scales_per_octave=cfg.get("scales_per_octave", 1))

    @nn.compact
    def __call__(self, feats, training: bool = False):
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)
        cls_convs = [(nn.Conv(self.feat_channels, (3, 3),
                              padding=((1, 1), (1, 1)),
                              kernel_init=normal_init(0.01),
                              name=f"cls_conv{i}"), gn(f"cls_gn{i}"))
                     for i in range(self.stacked_convs)]
        reg_convs = [(nn.Conv(self.feat_channels, (3, 3),
                              padding=((1, 1), (1, 1)),
                              kernel_init=normal_init(0.01),
                              name=f"reg_conv{i}"), gn(f"reg_gn{i}"))
                     for i in range(self.stacked_convs)]
        gfl_cls = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                          kernel_init=normal_init(0.01),
                          bias_init=bias_init_with_prob(0.01),
                          name="gfl_cls")
        gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3),
                          padding=((1, 1), (1, 1)),
                          kernel_init=normal_init(0.01), name="gfl_reg")
        scales = [Scale(name=f"scale{i}") for i in range(len(self.strides))]
        cls_scores, bbox_dists = [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for conv, norm in cls_convs:
                cf = nn.relu(norm(conv(cf)))
            for conv, norm in reg_convs:
                rf = nn.relu(norm(conv(rf)))
            cls_scores.append(gfl_cls(cf))
            bbox_dists.append(scales[lvl](gfl_reg(rf)))
        return tuple(cls_scores), tuple(bbox_dists)


def integral_distribution(dist_logits: jnp.ndarray,
                          reg_max: int) -> jnp.ndarray:
    """(..., 4*(reg_max+1)) logits → (..., 4) expected l/t/r/b (bin units)."""
    shape = dist_logits.shape[:-1]
    p = jax.nn.softmax(
        dist_logits.reshape(*shape, 4, reg_max + 1), axis=-1)
    bins = jnp.arange(reg_max + 1, dtype=p.dtype)
    return jnp.sum(p * bins, axis=-1)


def _anchor_centers(anchors: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([(anchors[..., 0] + anchors[..., 2]) * 0.5,
                      (anchors[..., 1] + anchors[..., 3]) * 0.5], -1)


def gfl_loss(head: GFLHead, cls_scores, bbox_dists, batch,
             axis_name: str | None = None):
    nc = head.num_classes
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = gen.flat_anchors(featmap_sizes)
    npl = gen.num_anchors(featmap_sizes)
    centers = _anchor_centers(anchors)                     # (A, 2)
    stride_arr = jnp.concatenate([
        jnp.full((n,), s, jnp.float32)
        for n, s in zip(npl, head.strides)])

    labels, assigned, _, _ = atss_assign(
        anchors, npl, batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], topk=head.topk, num_classes=nc)

    b = labels.shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    flat_dist = jnp.concatenate(
        [d.reshape(b, -1, 4 * (head.reg_max + 1)) for d in bbox_dists],
        axis=1)

    pos = labels < nc
    pos_f = pos.astype(jnp.float32)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    # decode predictions (bin units × stride at the anchor center)
    dist = integral_distribution(flat_dist, head.reg_max)  # (B, A, 4)
    decoded = distance2bbox(centers[None], dist * stride_arr[None, :, None])

    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
    # QFL target = IoU of the decoded box (reference gfl_head.py:265-268)
    quality = bbox_overlaps(decoded, gt, is_aligned=True)  # (B, A)
    quality = jnp.where(pos, jax.lax.stop_gradient(quality), 0.0)
    # bbox/DFL weights = detached max sigmoid score at positives
    # (reference gfl_head.py:257-258), normalized by their sum (:320-325)
    wt = jax.lax.stop_gradient(
        jnp.max(jax.nn.sigmoid(flat_cls), axis=-1)) * pos_f

    # loss config dicts honored (reference gfl config: QFL beta2 w1,
    # DFL w0.25, GIoU w2.0) or loudly rejected
    cls_cfg = dict(head.loss_cls or {})
    if cls_cfg.get("type", "QualityFocalLoss") != "QualityFocalLoss":
        raise NotImplementedError(
            f"GFL loss_cls {cls_cfg.get('type')!r} unsupported")
    bbox_cfg = dict(head.loss_bbox or {})
    if bbox_cfg.get("type", "GIoULoss") != "GIoULoss":
        raise NotImplementedError(
            f"GFL loss_bbox {bbox_cfg.get('type')!r} unsupported")
    dfl_cfg = dict(head.loss_dfl or {})

    num_pos = jnp.maximum(_psum(jnp.sum(pos_f)), 1.0)
    weight_denorm = jnp.maximum(_psum(jnp.sum(wt)), 1e-6)

    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * \
        L.quality_focal_loss(flat_cls, labels, quality,
                             beta=float(cls_cfg.get("beta", 2.0)),
                             avg_factor=num_pos)
    loss_bbox = float(bbox_cfg.get("loss_weight", 2.0)) * \
        L.giou_loss(decoded, gt, weight=wt, avg_factor=weight_denorm)
    # DFL per-side distance targets in BIN units: stride-normalize FIRST,
    # then clamp to [0, reg_max - 0.1] (reference gfl_head.py:255,268-271 —
    # clamping image-scale distances before normalizing would saturate at
    # reg_max PIXELS; caught by the torch oracle)
    s = stride_arr[None, :, None]
    tgt = bbox2distance(centers[None] / s, gt / s,
                        max_dis=head.reg_max, eps=0.1)
    dist_logits = flat_dist.reshape(b, -1, 4, head.reg_max + 1)
    loss_dfl = float(dfl_cfg.get("loss_weight", 0.25)) * \
        L.distribution_focal_loss(
            dist_logits, tgt, weight=wt[..., None] / 4.0,
            avg_factor=weight_denorm)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_dfl=loss_dfl)


def gfl_get_bboxes(head: GFLHead, cls_scores, bbox_dists, img_shapes=None,
                   scale_factors=None, nms_pre=1000, score_thr=0.05,
                   iou_threshold=0.6, max_per_img=100):
    nc = head.num_classes
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    lvl_anchors = gen.grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]

    boxes_all, scores_all = [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.sigmoid(cls_scores[lvl].reshape(b, -1, nc))
        dist_logits = bbox_dists[lvl].reshape(
            b, -1, 4 * (head.reg_max + 1))
        centers = _anchor_centers(lvl_anchors[lvl])[None].repeat(b, axis=0)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, top = jax.lax.top_k(rank, k)
        take = lambda a: jnp.take_along_axis(
            a, top.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
        scores, dist_logits, centers = (take(scores), take(dist_logits),
                                        take(centers))
        dist = integral_distribution(dist_logits, head.reg_max) \
            * head.strides[lvl]
        boxes = distance2bbox(centers, dist)
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
