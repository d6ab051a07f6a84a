"""PISA heads: PISARetinaHead and PISASSDHead.

Parity with ``/root/reference/mmdet/models/dense_heads/pisa_retinanet_head.py
:12-154`` and ``pisa_ssd_head.py:11-139``: the standard Retina/SSD target
assignment, with ISR-P reweighting of the positive classification loss and
the CARL classification-aware regression loss added
(``core/pisa.py`` implements the dense rank machinery).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.assigners import max_iou_assign
from dsl_tpu.core.boxes import (bbox2delta, bbox_overlaps,
                                delta2bbox, resolve_delta_coder)
from dsl_tpu.core.pisa import carl_weights, isr_p_rescale, isr_p_weights
from dsl_tpu.models.dense_heads.retina_head import RetinaHead
from dsl_tpu.models.dense_heads.ssd_head import SSDHead


@HEADS.register
class PISARetinaHead(RetinaHead):
    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2


@HEADS.register
class PISASSDHead(SSDHead):
    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2


def _flat_pisa_inputs(head, cls_scores, bbox_preds, batch, cls_channels,
                      gt_max_assign_all=True):
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = gen.flat_anchors(featmap_sizes)
    labels, assigned, weights, _ = max_iou_assign(
        anchors, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
        pos_iou_thr=head.pos_iou_thr, neg_iou_thr=head.neg_iou_thr,
        min_pos_iou=getattr(head, "min_pos_iou", 0.0),
        num_classes=head.num_classes, gt_max_assign_all=gt_max_assign_all)
    b = labels.shape[0]
    k = batch["gt_bboxes"].shape[1]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, cls_channels) for c in cls_scores],
        axis=1).reshape(-1, cls_channels)
    flat_reg = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1).reshape(-1, 4)
    anchors_f = jnp.tile(anchors, (b, 1))
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None],
        axis=1).reshape(-1, 4)
    # globally-unique gt id per positive (image offset x K)
    gids = (jnp.maximum(assigned, 0)
            + jnp.arange(b)[:, None] * k).reshape(-1)
    pos = (labels < head.num_classes).reshape(-1)
    # IoU of decoded prediction vs decoded target (isr_p ranking signal);
    # coder stds from the head's bbox_coder cfg when present
    _, dec, cd_means, cd_stds = resolve_delta_coder(
        getattr(head, "bbox_coder", None), head.target_means,
        head.target_stds)
    decoded = dec(anchors_f, jax.lax.stop_gradient(flat_reg),
                  cd_means, cd_stds)
    ious = bbox_overlaps(decoded, gt, is_aligned=True)
    return (anchors_f, labels.reshape(-1), weights.reshape(-1), flat_cls,
            flat_reg, gt, gids, pos, ious, cd_means, cd_stds)


def pisa_retina_loss(head: PISARetinaHead, cls_scores, bbox_preds, batch,
                     axis_name=None):
    """Reference ``pisa_retinanet_head.py:21-154`` with the
    ``pisa_retinanet_r50_fpn_1x_coco.py`` cfg: focal cls with ISR-P
    reweighted positive label weights, SmoothL1(beta .11) bbox loss, CARL =
    the same SmoothL1 'none' / num_pos weighted by normalized sigmoid scores
    at the gt class."""
    nc = head.num_classes
    (anchors_f, labels, weights, flat_cls, flat_reg, gt, gids, pos,
     ious, cd_means, cd_stds) = _flat_pisa_inputs(
        head, cls_scores, bbox_preds, batch, nc)

    num_pos = jnp.maximum(pos.astype(jnp.float32).sum(), 1.0)
    if axis_name:
        num_pos = jax.lax.psum(num_pos, axis_name)

    cls_cfg = dict(head.loss_cls or {})
    gamma = float(cls_cfg.get("gamma", 2.0))
    alpha = float(cls_cfg.get("alpha", 0.25))
    bbox_cfg = dict(head.loss_bbox or {})
    beta = float(bbox_cfg.get("beta", 0.11))
    bbox_lw = float(bbox_cfg.get("loss_weight", 1.0))

    isr_w = isr_p_weights(labels, pos, gids, ious, nc,
                          k=head.isr_k, bias=head.isr_bias)
    per_anchor = L.sigmoid_focal_loss(flat_cls, labels, gamma=gamma,
                                      alpha=alpha, reduction="none").sum(-1)
    final_w = isr_p_rescale(per_anchor, weights, isr_w, pos)
    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * \
        jnp.sum(per_anchor * final_w) / num_pos

    tgt = bbox2delta(anchors_f, gt, cd_means, cd_stds)
    posf = pos.astype(jnp.float32)
    loss_bbox = bbox_lw * L.smooth_l1_loss(
        flat_reg, tgt, beta=beta, weight=posf[:, None], avg_factor=num_pos)

    # CARL: the head's reg loss ('none') / num_pos, weighted by the
    # normalized cls score at the gt class (``carl_loss`` :120-183)
    carl_w = carl_weights(flat_cls, labels, pos, nc, k=head.carl_k,
                          bias=head.carl_bias, sigmoid=True)
    reg_l = bbox_lw * L.smooth_l1_loss(
        flat_reg, tgt, beta=beta, reduction="none").sum(-1) / num_pos
    loss_carl = jnp.sum(reg_l * carl_w * posf)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_carl=loss_carl)


def pisa_ssd_loss(head: PISASSDHead, cls_scores, bbox_preds, batch,
                  axis_name=None):
    """Reference ``pisa_ssd_head.py:11-139``: the stock SSD per-image OHEM
    CE (3:1 topk hard negatives), with the POSITIVE label weights replaced
    by ISR-P before mining, plus CARL with SmoothL1(beta 1) and softmax
    scores. avg = num_total_pos throughout."""
    nc = head.num_classes
    (anchors_f, labels, weights, flat_cls, flat_reg, gt, gids, pos,
     ious, cd_means, cd_stds) = _flat_pisa_inputs(
        head, cls_scores, bbox_preds, batch, nc + 1,
        gt_max_assign_all=False)

    num_pos = jnp.maximum(pos.astype(jnp.float32).sum(), 1.0)
    if axis_name:
        num_pos = jax.lax.psum(num_pos, axis_name)

    ce = L.cross_entropy(flat_cls, labels, reduction="none")       # (N,)
    isr_w = isr_p_weights(labels, pos, gids, ious, nc,
                          k=head.isr_k, bias=head.isr_bias)
    # the rescale normalizer is a plain CrossEntropyLoss in the reference
    # (``pisa_ssd_head.py`` isr_p call), i.e. exactly ``ce``
    pos_w = isr_p_rescale(ce, weights, isr_w, pos)                 # (N,)

    # per-image OHEM on the ISR-weighted loss (SSDHead.loss_single with
    # the updated label_weights)
    b = batch["gt_bboxes"].shape[0]
    a = labels.shape[0] // b
    ce_w = (ce * pos_w).reshape(b, a)
    pos_bi = pos.reshape(b, a)
    neg_mask = (labels == nc).reshape(b, a) & (weights > 0).reshape(b, a)
    neg_loss = jnp.where(neg_mask, ce_w, -1e30)
    n_pos_img = pos_bi.astype(jnp.float32).sum(axis=1)
    sorted_neg = -jnp.sort(-neg_loss, axis=1)
    idx = jnp.clip((head.neg_pos_ratio * n_pos_img).astype(jnp.int32),
                   1, a - 1)
    thresh = jnp.take_along_axis(sorted_neg, idx[:, None], axis=1)
    keep_neg = neg_mask & (neg_loss > thresh)
    loss_cls = jnp.sum(
        ce_w * (pos_bi.astype(jnp.float32)
                + keep_neg.astype(jnp.float32))) / num_pos

    tgt = bbox2delta(anchors_f, gt, cd_means, cd_stds)
    posf = pos.astype(jnp.float32)
    loss_bbox = L.smooth_l1_loss(flat_reg, tgt, beta=1.0,
                                 weight=posf[:, None], avg_factor=num_pos)
    carl_w = carl_weights(flat_cls, labels, pos, nc, k=head.carl_k,
                          bias=head.carl_bias, sigmoid=False)
    reg_l = L.smooth_l1_loss(flat_reg, tgt, beta=1.0,
                             reduction="none").sum(-1) / num_pos
    loss_carl = jnp.sum(reg_l * carl_w * posf)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_carl=loss_carl)
