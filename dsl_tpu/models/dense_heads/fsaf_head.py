"""FSAF head: anchor-free branch with online feature selection.

Parity with ``/root/reference/mmdet/models/dense_heads/fsaf_head.py`` +
``core/bbox/assigners/center_region_assigner.py`` (the FSAF config
``configs/fsaf/fsaf_r50_fpn_1x_coco.py``: pos_scale = neg_scale = 0.2,
min_pos_iof 0.01, TBLR coder normalizer 4, IoU reg loss, one size=stride
anchor per cell at center_offset 0):

- CenterRegionAssigner over the concatenated multi-level anchors: a prior
  is a core candidate for a gt when its center lies strictly inside the
  FULL gt and its IoF with the 0.2-scaled core exceeds 0.01; among
  multiple core matches the smallest-area gt wins
  (``center_region_assigner.py:127-257``).
- Shadowed (prior, class) pairs — shadow-region overlaps plus losing core
  matches — get their classification weight zeroed per CLASS; a positive
  whose own class is shadowed by another gt is demoted to background
  (``:232-248``).
- Online level selection: each gt back-propagates only at the level with
  the smallest mean (focal-cls + IoU-reg) loss over its pixels
  (``fsaf_head.py:365-380`` collect / ``:398-432`` reweight); rejected
  positives keep all other class channels and only zero their own label's
  channel and their reg weight.
- avg_factor = surviving positives (or + negatives when zero)
  (``fsaf_head.py:303-309``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.boxes import bbox_overlaps, tblr2bboxes
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import bias_init_with_prob, normal_init

INF = 1e6


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
    neg_scale: float = 0.2
    min_pos_iof: float = 0.01
    ignore_gt_scale: float = 0.5
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
            # FSAF forward_single: relu — TBLR only accepts positive preds
            reg_out.append(nn.relu(conv_reg(rf)))
        return tuple(cls_out), tuple(reg_out)


def _scale_boxes(boxes, scale):
    """``center_region_assigner.py:9-33`` scale_boxes."""
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    hw = (boxes[..., 2] - boxes[..., 0]) * 0.5 * scale
    hh = (boxes[..., 3] - boxes[..., 1]) * 0.5 * scale
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def _fsaf_anchors(head, cls_scores):
    """One size=stride anchor per cell, centers at grid*stride
    (AnchorGenerator octave_base_scale=1, center_offset=0)."""
    anchors_l, lvl_l = [], []
    for lvl, c in enumerate(cls_scores):
        h, w = c.shape[1:3]
        s = float(head.strides[lvl])
        xs = jnp.arange(w, dtype=jnp.float32) * s
        ys = jnp.arange(h, dtype=jnp.float32) * s
        cx, cy = jnp.meshgrid(xs, ys)
        ctr = jnp.stack([cx, cy], -1).reshape(-1, 2)
        anchors_l.append(jnp.concatenate([ctr - s / 2, ctr + s / 2], -1))
        lvl_l.append(jnp.full((h * w,), lvl, jnp.int32))
    return jnp.concatenate(anchors_l), jnp.concatenate(lvl_l)


def fsaf_loss(head: FSAFHead, cls_scores, bbox_preds, batch,
              axis_name: str | None = None):
    nc = head.num_classes
    b = cls_scores[0].shape[0]
    nl = len(cls_scores)
    gt = batch["gt_bboxes"]
    gtl = jnp.clip(batch["gt_labels"], 0, nc - 1)
    gtv = batch["gt_valid"]
    k = gt.shape[1]

    anchors, lvl_of = _fsaf_anchors(head, cls_scores)         # (A, 4), (A,)
    a = anchors.shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    flat_reg = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1)
    # reference loss(): bbox_preds[i].clamp(min=1e-4)
    flat_reg = jnp.maximum(flat_reg, 1e-4)

    core_box = _scale_boxes(gt, head.pos_scale)
    shadow_box = _scale_boxes(gt, head.neg_scale)
    area = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])
    area = jnp.where(gtv, area, jnp.inf)
    # gt priority: smaller area preferred (rank in descending-area order)
    order = jnp.argsort(-area, axis=1)
    rank = jnp.argsort(order, axis=1)                         # (B, K)

    ctr = (anchors[:, :2] + anchors[:, 2:]) * 0.5             # (A, 2)
    in_gt = ((ctr[None, :, None, 0] > gt[:, None, :, 0])
             & (ctr[None, :, None, 0] < gt[:, None, :, 2])
             & (ctr[None, :, None, 1] > gt[:, None, :, 1])
             & (ctr[None, :, None, 1] < gt[:, None, :, 3]))   # (B, A, K)
    iof = lambda boxes: jax.vmap(
        lambda bx: bbox_overlaps(anchors, bx, mode="iof"))(boxes)
    core = in_gt & (iof(core_box) > head.min_pos_iof) & gtv[:, None, :]
    shadow = (iof(shadow_box) > head.min_pos_iof) \
        & gtv[:, None, :] & ~core

    pr = jnp.where(core, rank[:, None, :], -1)
    assigned = jnp.argmax(pr, axis=-1)                        # (B, A)
    pos = core.any(axis=-1)
    chosen = (jax.nn.one_hot(assigned, k, dtype=bool)
              & pos[..., None])
    shadow = shadow | (core & ~chosen)                        # losing matches
    # override: positive whose own class is shadowed → background
    alab = jnp.take_along_axis(gtl, assigned, axis=1)         # (B, A)
    same = shadow & (gtl[:, None, :] == alab[..., None])
    pos = pos & ~same.any(axis=-1)

    ignored = jnp.zeros((b, a), bool)
    if batch.get("ignore_bboxes") is not None:
        ig = _scale_boxes(batch["ignore_bboxes"], head.ignore_gt_scale)
        in_ig = ((ctr[None, :, None, 0] > ig[:, None, :, 0])
                 & (ctr[None, :, None, 0] < ig[:, None, :, 2])
                 & (ctr[None, :, None, 1] > ig[:, None, :, 1])
                 & (ctr[None, :, None, 1] < ig[:, None, :, 3])
                 & batch["ignore_valid"][:, None, :])
        ignored = in_ig.any(axis=-1)
        pos = pos & ~ignored

    labels = jnp.where(pos, alab, nc)
    neg = ~pos & ~ignored
    posf = pos.astype(jnp.float32)
    # per-class label weights: 1 on pos|neg rows, shadow pairs zero their
    # gt's class channel (matmul scatter: (B,A,K) @ (B,K,C))
    shadow_cls = jnp.einsum(
        "bak,bkc->bac", shadow.astype(jnp.float32),
        jax.nn.one_hot(gtl, nc)) > 0
    lw = (pos | neg)[..., None].astype(jnp.float32) \
        * (1.0 - shadow_cls.astype(jnp.float32))

    cls_map = L.sigmoid_focal_loss(flat_cls, labels,
                                   reduction="none") * lw    # (B, A, C)
    g = jnp.take_along_axis(gt, assigned[..., None], axis=1)  # (B, A, 4)
    decoded = tblr2bboxes(anchors[None], flat_reg,
                          normalizer=head.normalizer)
    ious = bbox_overlaps(decoded, g, is_aligned=True)
    reg_map = -jnp.log(jnp.clip(ious, 1e-6, None)) * posf     # (B, A)

    # per-(gt, level) mean loss table → online level selection
    joint = jax.lax.stop_gradient(cls_map.sum(-1) + reg_map)
    idx = assigned * nl + lvl_of[None, :]                     # (B, A)

    def _tab(j, ix, pf):
        s = jnp.zeros((k * nl,)).at[ix].add(j * pf)
        c = jnp.zeros((k * nl,)).at[ix].add(pf)
        return s, c

    sums, cnts = jax.vmap(_tab)(joint, idx, posf)
    table = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0),
                      INF).reshape(b, k, nl)
    best = jnp.argmin(table, axis=-1)                         # (B, K)

    best_of = jnp.take_along_axis(best, assigned, axis=1)     # (B, A)
    keep = pos & (best_of == lvl_of[None, :])
    rejected = pos & ~keep
    # rejected positives: zero ONLY their label's channel + reg weight
    rej_cls = jax.nn.one_hot(jnp.where(rejected, alab, nc), nc)
    cls_final = (cls_map * (1.0 - rej_cls)).sum()
    reg_final = (reg_map * keep.astype(jnp.float32)).sum()

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    num_pos = _psum(keep.astype(jnp.float32).sum())
    num_neg = _psum(neg.astype(jnp.float32).sum())
    avg = jnp.where(num_pos > 0, num_pos, num_pos + num_neg)
    return dict(loss_cls=_psum(cls_final) / avg,
                loss_bbox=_psum(reg_final) / avg,
                num_pos=num_pos / b)


def fsaf_get_bboxes(head: FSAFHead, cls_scores, bbox_preds, img_shapes=None,
                    scale_factors=None, nms_pre=1000, score_thr=0.05,
                    iou_threshold=0.5, max_per_img=100):
    nc = head.num_classes
    b = cls_scores[0].shape[0]
    boxes_all, scores_all = [], []
    for lvl, (c, r) in enumerate(zip(cls_scores, bbox_preds)):
        h, w = c.shape[1:3]
        s = float(head.strides[lvl])
        xs = jnp.arange(w, dtype=jnp.float32) * s
        ys = jnp.arange(h, dtype=jnp.float32) * s
        cx, cy = jnp.meshgrid(xs, ys)
        ctr = jnp.stack([cx, cy], -1).reshape(-1, 2)
        prior = jnp.concatenate([ctr - s / 2, ctr + s / 2], -1)[None]
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
        take = lambda t: jnp.take_along_axis(
            t, idx.reshape(b, kk, *(1,) * (t.ndim - 2)), axis=1)
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
