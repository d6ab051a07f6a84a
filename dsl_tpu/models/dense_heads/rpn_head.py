"""RPN head: class-agnostic anchor proposals for the two-stage tier.

Parity with ``/root/reference/mmdet/models/dense_heads/rpn_head.py``: one
3x3 conv + 1x1 objectness / 1x1 delta predictors over FPN levels, MaxIoU
assignment (pos 0.7 / neg 0.3, low-quality match), BCE + L1 losses, and a
fixed-shape proposal path: per-level top-k by score → delta decode → NMS →
``num_proposals`` padded outputs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.assigners import max_iou_assign
from dsl_tpu.core.boxes import (bbox2delta, delta2bbox,
                                resolve_delta_coder)
from dsl_tpu.core import losses as L
from dsl_tpu.core.nms import nms
from dsl_tpu.models.layers import normal_init


@HEADS.register
class RPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_scales: Sequence[float] = (8.0,)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    anchor_generator: dict | None = None
    bbox_coder: dict | None = None   # LegacyDeltaXYWHBBoxCoder supported
    loss_cls: dict | None = None    # CrossEntropyLoss(use_sigmoid) only
    loss_bbox: dict | None = None   # L1 (default) or SmoothL1(beta)

    def make_anchor_generator(self) -> AnchorGenerator:
        from dsl_tpu.core.anchors import anchor_generator_from_cfg

        return anchor_generator_from_cfg(
            self.anchor_generator,
            strides=list(self.strides), ratios=list(self.anchor_ratios),
            scales=list(self.anchor_scales))

    @nn.compact
    def __call__(self, feats, training: bool = False):
        num_anchors = len(self.anchor_scales) * len(self.anchor_ratios)
        rpn_conv = nn.Conv(self.feat_channels, (3, 3),
                           padding=((1, 1), (1, 1)),
                           kernel_init=normal_init(0.01), name="rpn_conv")
        rpn_cls = nn.Conv(num_anchors, (1, 1), padding="VALID",
                          kernel_init=normal_init(0.01), name="rpn_cls")
        rpn_reg = nn.Conv(num_anchors * 4, (1, 1), padding="VALID",
                          kernel_init=normal_init(0.01), name="rpn_reg")
        scores, deltas = [], []
        for x in feats:
            h = nn.relu(rpn_conv(x))
            scores.append(rpn_cls(h))
            deltas.append(rpn_reg(h))
        return tuple(scores), tuple(deltas)


def subsample_anchors(rng_key, is_pos, is_neg, num: int, pos_fraction: float):
    """Fixed-shape RandomSampler over dense anchors (reference
    ``random_sampler.py`` via ``anchor_head.py:85-87``): per image, up to
    ``num*pos_fraction`` random positives, negatives fill to ``num``.

    Returns boolean take-masks ``(pos_take, sel)`` of the anchor axis —
    ``sel`` is the sampled set (pos_take | sampled negatives). Implemented
    as two ``top_k``s over random priorities (no unsorted dynamic shapes)."""
    b, a = is_pos.shape
    r = jax.random.uniform(rng_key, (b, a))
    rows = jnp.arange(b)[:, None]

    def _take(mask, pri, k):
        _, idx = jax.lax.top_k(-pri, min(k, a))
        take = jnp.zeros_like(mask)
        take = take.at[rows, idx].set(True)
        return take & mask

    pos_take = _take(is_pos, jnp.where(is_pos, r, jnp.inf),
                     int(num * pos_fraction))
    # positives rank ahead of every negative, so top_k(num) keeps them all
    # and fills the remainder (num - num_pos) with random negatives
    pri = jnp.where(pos_take, r, jnp.where(is_neg, 1e6 + r, jnp.inf))
    sel = _take(pos_take | is_neg, pri, num)
    return pos_take, sel


def _resolve_rpn_bbox_loss(cfg):
    """RPN ``loss_bbox`` cfg → fn(pred, target, weight, avg_factor). L1 is
    the reference default (``faster_rcnn_r50_fpn.py:34``); cascade families
    use SmoothL1(beta=1/9) (``cascade_rcnn_r50_fpn.py:41``)."""
    cfg = dict(cfg or {})
    t = cfg.get("type", "L1Loss")
    lw = float(cfg.get("loss_weight", 1.0))
    if t == "L1Loss":
        return lambda p, tg, w, af: lw * L.l1_loss(
            p, tg, weight=w, avg_factor=af)
    if t == "SmoothL1Loss":
        beta = float(cfg.get("beta", 1.0))
        return lambda p, tg, w, af: lw * L.smooth_l1_loss(
            p, tg, beta=beta, weight=w, avg_factor=af)
    raise ValueError(f"unsupported rpn loss_bbox type: {t}")


def rpn_loss(head: RPNHead, scores, deltas, batch,
             axis_name: str | None = None, train_cfg: dict | None = None,
             rng_key=None):
    """RPN training loss with reference ``train_cfg.rpn`` semantics
    (``anchor_head.py loss/loss_single:440-489,372-418`` +
    ``faster_rcnn_r50_fpn.py:58-74``): MaxIoU assignment (0.7/0.3,
    ``min_pos_iou=0.3``, low-quality match), a 256-anchor random subsample
    at 1:1 pos fraction, and BOTH losses averaged by
    ``num_total_samples = num_pos + num_neg`` of the sampled set."""
    tc = dict(train_cfg or {})
    asn = dict(tc.get("assigner", {}) or {})
    smp = dict(tc.get("sampler", {}) or {})
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(s.shape[1:3]) for s in scores]
    anchors = gen.flat_anchors(featmap_sizes)

    # allowed_border anchor filtering (anchor_inside_flags; the standalone
    # ``configs/rpn/*`` train_cfg uses allowed_border=0 — border anchors
    # are excluded from assignment entirely)
    border = float(tc.get("allowed_border", -1))
    inside = None
    if border >= 0 and batch.get("img_shapes") is not None:
        hw = batch["img_shapes"]
        inside = jax.vmap(
            lambda hw_i: ((anchors[:, 0] >= -border)
                          & (anchors[:, 1] >= -border)
                          & (anchors[:, 2] < hw_i[1] + border)
                          & (anchors[:, 3] < hw_i[0] + border)))(hw)

    # class-agnostic: every gt has label 0
    labels, assigned, weights, _ = max_iou_assign(
        anchors, batch["gt_bboxes"],
        jnp.zeros_like(batch["gt_labels"]), batch["gt_valid"],
        pos_iou_thr=float(asn.get("pos_iou_thr", head.pos_iou_thr)),
        neg_iou_thr=float(asn.get("neg_iou_thr", head.neg_iou_thr)),
        min_pos_iou=float(asn.get("min_pos_iou", 0.3)),
        match_low_quality=bool(asn.get("match_low_quality", True)),
        num_classes=1, inside=inside)

    b = labels.shape[0]
    flat_score = jnp.concatenate(
        [s.reshape(b, -1) for s in scores], axis=1)
    flat_delta = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in deltas], axis=1)
    is_pos = labels < 1
    is_neg = (weights > 0) & ~is_pos
    pos_take, sel = subsample_anchors(
        rng_key, is_pos, is_neg, num=int(smp.get("num", 256)),
        pos_fraction=float(smp.get("pos_fraction", 0.5)))
    pos_f = pos_take.astype(jnp.float32)
    sel_f = sel.astype(jnp.float32)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    num_total = jnp.maximum(_psum(jnp.sum(sel_f)), 1.0)
    cls_cfg = dict(head.loss_cls or {})
    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) \
        * L.binary_cross_entropy(flat_score, pos_f, weight=sel_f,
                                 avg_factor=num_total)
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
    enc, _, cd_means, cd_stds = resolve_delta_coder(
        head.bbox_coder, head.target_means, head.target_stds)
    tgt = enc(anchors[None], gt, cd_means, cd_stds)
    loss_reg = _resolve_rpn_bbox_loss(head.loss_bbox)(
        flat_delta, tgt, pos_f[..., None], num_total)
    return dict(loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_reg)


def rpn_proposals(head: RPNHead, scores, deltas, img_shapes=None,
                  nms_pre: int = 1000, nms_iou: float = 0.7,
                  num_proposals: int = 1000, min_bbox_size: float = 0.0):
    """Fixed-shape proposal generation (reference ``rpn_head.py
    _get_bboxes:165-230``): per-level sigmoid + nms_pre topk, decode+clip,
    ``min_bbox_size`` filter, and NMS with LEVEL-ID offsets — proposals
    from different FPN levels never suppress each other.

    Returns (proposals (B, num_proposals, 4), scores (B, num_proposals),
    valid (B, num_proposals)).
    """
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(s.shape[1:3]) for s in scores]
    lvl_anchors = gen.grid_anchors(featmap_sizes)
    b = scores[0].shape[0]

    box_list, score_list = [], []
    for lvl in range(len(scores)):
        sc = jax.nn.sigmoid(scores[lvl].reshape(b, -1))
        dl = deltas[lvl].reshape(b, -1, 4)
        anchors = lvl_anchors[lvl][None].repeat(b, axis=0)
        k = min(nms_pre, sc.shape[1])
        top_sc, top_idx = jax.lax.top_k(sc, k)
        take = lambda a: jnp.take_along_axis(
            a, top_idx[..., None].repeat(a.shape[-1], -1), axis=1)
        dl, anchors = take(dl), take(anchors)
        _, dec, cd_means, cd_stds = resolve_delta_coder(
            head.bbox_coder, head.target_means, head.target_stds)
        boxes = dec(anchors, dl, cd_means, cd_stds)
        if img_shapes is not None:
            xlim = img_shapes[:, None, 1:2]
            ylim = img_shapes[:, None, 0:1]
            boxes = jnp.concatenate(
                [jnp.clip(boxes[..., 0:1], 0, xlim),
                 jnp.clip(boxes[..., 1:2], 0, ylim),
                 jnp.clip(boxes[..., 2:3], 0, xlim),
                 jnp.clip(boxes[..., 3:4], 0, ylim)], axis=-1)
        box_list.append(boxes)
        score_list.append(top_sc)
    boxes = jnp.concatenate(box_list, axis=1)
    sc = jnp.concatenate(score_list, axis=1)
    # per-candidate FPN level ids (static): levels are independent in NMS
    lvl_ids = jnp.concatenate([
        jnp.full((bl.shape[1],), i, jnp.float32)
        for i, bl in enumerate(box_list)])

    def _single(bx, s):
        size_ok = ((bx[:, 2] - bx[:, 0] > min_bbox_size)
                   & (bx[:, 3] - bx[:, 1] > min_bbox_size))
        max_coord = jnp.max(jnp.where(size_ok[:, None], bx, 0.0)) + 1.0
        shifted = bx + (lvl_ids * max_coord)[:, None]
        dets, idx, valid = nms(shifted, s, nms_iou, max_out=num_proposals,
                               valid=size_ok)
        out_boxes = jnp.where(valid[:, None], bx[idx], 0.0)
        return out_boxes, dets[:, 4], valid

    return jax.vmap(_single)(boxes, sc)


def rpn_loss_any(head, rpn_out, batch, train_cfg=None, rng_key=None, **kw):
    """Dispatch RPN losses by head type (RPNHead / GARPNHead /
    CascadeRPNHead). ``train_cfg``/``rng_key`` apply to the plain RPNHead
    (GA/Cascade RPN carry their own assignment machinery)."""
    if type(head).__name__ == "GARPNHead":
        from dsl_tpu.models.dense_heads.ga_rpn_head import ga_rpn_loss

        return ga_rpn_loss(head, rpn_out, batch)
    if type(head).__name__ == "CascadeRPNHead":
        from dsl_tpu.models.dense_heads.cascade_rpn_head import \
            cascade_rpn_loss

        return cascade_rpn_loss(head, rpn_out, batch)
    scores, deltas = rpn_out
    return rpn_loss(head, scores, deltas, batch, train_cfg=train_cfg,
                    rng_key=rng_key, **kw)


def rpn_proposals_any(head, rpn_out, img_shapes=None, nms_pre: int = 1000,
                      num_proposals: int = 1000):
    if type(head).__name__ == "GARPNHead":
        from dsl_tpu.models.dense_heads.ga_rpn_head import ga_rpn_proposals

        return ga_rpn_proposals(head, rpn_out, img_shapes=img_shapes,
                                nms_pre=nms_pre,
                                num_proposals=num_proposals)
    if type(head).__name__ == "CascadeRPNHead":
        from dsl_tpu.models.dense_heads.cascade_rpn_head import \
            cascade_rpn_proposals

        return cascade_rpn_proposals(head, rpn_out, img_shapes=img_shapes,
                                     nms_pre=nms_pre,
                                     num_proposals=num_proposals)
    scores, deltas = rpn_out
    return rpn_proposals(head, scores, deltas, img_shapes=img_shapes,
                         nms_pre=nms_pre, num_proposals=num_proposals)
