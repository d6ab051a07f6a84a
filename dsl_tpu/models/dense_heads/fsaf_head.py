"""FSAF head: anchor-free branch with online feature selection.

Parity with ``/root/reference/mmdet/models/dense_heads/fsaf_head.py`` +
``core/bbox/assigners/center_region_assigner.py`` (the FSAF config:
pos_scale = neg_scale = 0.2, TBLR coder normalizer 4, IoU reg loss):
pixels inside the 0.2-scaled center region of a GT are positive candidates
(smaller GT wins overlaps); each GT is then assigned ONLINE to the single
FPN level where its summed (focal cls + IoU reg) loss is smallest
(``collect_loss_level_single``/``reweight_loss_single``); other levels'
candidates are zero-weighted.

TPU redesign: per-level dense masked candidate maps; the per-(gt, level)
loss table is a scatter-add; level selection is an argmin over the stacked
table — no python over GTs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.boxes import bbox_overlaps, bboxes2tblr, tblr2bboxes
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.core.points import MlvlPointGenerator
from dsl_tpu.models.layers import bias_init_with_prob, normal_init

INF = 1e8


@HEADS.register
class FSAFHead(nn.Module):
    """Retina-style towers, 1 (implicit) anchor: cls (C) + reg (4, relu'd
    TBLR) per pixel."""

    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    pos_scale: float = 0.2
    normalizer: float = 4.0

    @nn.compact
    def __call__(self, feats, training: bool = False):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=normal_init(0.01),
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=normal_init(0.01),
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                           kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           name="retina_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1,
                           kernel_init=normal_init(0.01), name="retina_reg")
        cls_out, reg_out = [], []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            cls_out.append(conv_cls(cf))
            # FSAF forward_single: relu'd TBLR prediction (+ small eps)
            reg_out.append(nn.relu(conv_reg(rf)) + 1e-4)
        return tuple(cls_out), tuple(reg_out)


def _center_region(gt, scale):
    cx = (gt[..., 0] + gt[..., 2]) / 2
    cy = (gt[..., 1] + gt[..., 3]) / 2
    hw = (gt[..., 2] - gt[..., 0]) / 2 * scale
    hh = (gt[..., 3] - gt[..., 1]) / 2 * scale
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def fsaf_loss(head: FSAFHead, cls_scores, bbox_preds, batch,
              axis_name: str | None = None):
    nc = head.num_classes
    b = cls_scores[0].shape[0]
    k = batch["gt_bboxes"].shape[1]
    gt = batch["gt_bboxes"]
    gtl = jnp.clip(batch["gt_labels"], 0, nc - 1)
    gtv = batch["gt_valid"]
    eff = _center_region(gt, head.pos_scale)                # (B, K, 4)
    area = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])

    gen = MlvlPointGenerator(list(head.strides), offset=0.5)
    per_level = []
    for lvl, (c, r) in enumerate(zip(cls_scores, bbox_preds)):
        h, w = c.shape[1:3]
        stride = float(head.strides[lvl])
        pts = jnp.asarray(gen.single_level_points((h, w), stride))  # (P, 2)
        p = pts.shape[0]
        px, py = pts[:, 0], pts[:, 1]
        inside = ((px[None, :, None] >= eff[:, None, :, 0])
                  & (px[None, :, None] <= eff[:, None, :, 2])
                  & (py[None, :, None] >= eff[:, None, :, 1])
                  & (py[None, :, None] <= eff[:, None, :, 3])
                  & gtv[:, None, :])                          # (B, P, K)
        pick = jnp.where(inside, area[:, None, :], INF)
        gi = jnp.argmin(pick, axis=-1)                        # (B, P)
        pos = inside.any(axis=-1)
        labels = jnp.where(pos, jnp.take_along_axis(gtl, gi, axis=1), nc)
        g = jnp.take_along_axis(gt, gi[..., None], axis=1)    # (B, P, 4)

        flat_cls = c.reshape(b, p, nc)
        flat_reg = r.reshape(b, p, 4)
        # per-pixel losses
        cls_l = L.sigmoid_focal_loss(flat_cls, labels,
                                     reduction="none").sum(-1)  # (B, P)
        prior = jnp.concatenate([pts - stride / 2, pts + stride / 2],
                                axis=-1)[None]                # (1, P, 4)
        decoded = tblr2bboxes(prior, flat_reg,
                              normalizer=head.normalizer)
        ious = bbox_overlaps(decoded, g, is_aligned=True)
        reg_l = -jnp.log(jnp.clip(ious, 1e-6, 1.0))           # IoULoss
        joint = jax.lax.stop_gradient(cls_l + reg_l)

        # per-(gt, level) summed loss over its pixels (mean over count)
        posf = pos.astype(jnp.float32)
        per_gt_sum = jnp.zeros((b, k)).at[
            jnp.arange(b)[:, None].repeat(p, 1), gi].add(joint * posf)
        per_gt_cnt = jnp.zeros((b, k)).at[
            jnp.arange(b)[:, None].repeat(p, 1), gi].add(posf)
        per_level.append(dict(
            cls_l=cls_l, reg_l=reg_l, pos=pos, gi=gi, labels=labels,
            flat_cls=flat_cls,
            gt_loss=per_gt_sum / jnp.maximum(per_gt_cnt, 1.0),
            has=per_gt_cnt > 0))
    # online level selection per gt
    table = jnp.stack([jnp.where(d["has"], d["gt_loss"], INF)
                       for d in per_level], axis=-1)          # (B, K, L)
    best = jnp.argmin(table, axis=-1)                         # (B, K)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    total_cls, total_reg, num_pos = 0.0, 0.0, 0.0
    for lvl, d in enumerate(per_level):
        sel = jnp.take_along_axis(best, d["gi"], axis=1) == lvl  # (B, P)
        w_pos = (d["pos"] & sel).astype(jnp.float32)
        # negatives everywhere outside ANY effective region at this level
        neg = (~d["pos"]).astype(jnp.float32)
        labels_sel = jnp.where(w_pos > 0, d["labels"], nc)
        cls_map = L.sigmoid_focal_loss(d["flat_cls"], labels_sel,
                                       reduction="none").sum(-1)
        total_cls = total_cls + (cls_map * (w_pos + neg)).sum()
        total_reg = total_reg + (d["reg_l"] * w_pos).sum()
        num_pos = num_pos + w_pos.sum()
    num_pos = jnp.maximum(_psum(num_pos), 1.0)
    return dict(loss_cls=total_cls / num_pos,
                loss_bbox=total_reg / num_pos)


def fsaf_get_bboxes(head: FSAFHead, cls_scores, bbox_preds, img_shapes=None,
                    scale_factors=None, nms_pre=1000, score_thr=0.05,
                    iou_threshold=0.5, max_per_img=100):
    nc = head.num_classes
    b = cls_scores[0].shape[0]
    gen = MlvlPointGenerator(list(head.strides), offset=0.5)
    boxes_all, scores_all = [], []
    for lvl, (c, r) in enumerate(zip(cls_scores, bbox_preds)):
        h, w = c.shape[1:3]
        stride = float(head.strides[lvl])
        pts = jnp.asarray(gen.single_level_points((h, w), stride))
        prior = jnp.concatenate([pts - stride / 2, pts + stride / 2],
                                axis=-1)[None]
        scores = jax.nn.sigmoid(c.reshape(b, -1, nc))
        box = tblr2bboxes(prior, r.reshape(b, -1, 4),
                          normalizer=head.normalizer)
        if img_shapes is not None:
            xlim = img_shapes[:, None, 1:2]
            ylim = img_shapes[:, None, 0:1]
            box = jnp.concatenate(
                [jnp.clip(box[..., 0:1], 0, xlim),
                 jnp.clip(box[..., 1:2], 0, ylim),
                 jnp.clip(box[..., 2:3], 0, xlim),
                 jnp.clip(box[..., 3:4], 0, ylim)], axis=-1)
        kk = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, idx = jax.lax.top_k(rank, kk)
        take = lambda a: jnp.take_along_axis(
            a, idx.reshape(b, kk, *(1,) * (a.ndim - 2)), axis=1)
        boxes_all.append(take(box))
        scores_all.append(take(scores))
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc):
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img)

    return jax.vmap(_single)(boxes, scores)
