"""GA-RPN: guided-anchoring region proposal head.

Parity with ``/root/reference/mmdet/models/dense_heads/ga_rpn_head.py:
13-176``: a 3x3 rpn conv, then the GuidedAnchorHead machinery
(loc/shape branches + feature adaption) with class-agnostic BCE cls and
smooth-L1 reg on the guided anchors; proposals = loc-filtered guided
anchors decoded and NMS'd per image.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.assigners import (_max_iou_assign_single,
                                    approx_max_iou_assign)
from dsl_tpu.core.boxes import bbox2delta, delta2bbox
from dsl_tpu.core.nms import NEG_INF, nms
from dsl_tpu.models.dense_heads.ga_retina_head import (
    FeatureAdaption, GARetinaHead, _guided_anchors, _loc_targets)
from dsl_tpu.models.layers import bias_init_with_prob, normal_init


@HEADS.register
class GARPNHead(GARetinaHead):
    """Class-agnostic GA head for proposals. Reuses the GARetinaHead
    generators/targets with num_classes=1 and a single shared tower."""

    num_classes: int = 1
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    octave_base_scale: int = 8
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3
    ga_pos_iou_thr: float = 0.7
    ga_neg_iou_thr: float = 0.3
    ga_min_pos_iou: float = 0.3
    allowed_border: float = 0.0    # rpn_r50_fpn.py train_cfg
    target_stds: Sequence[float] = (0.07, 0.07, 0.11, 0.11)
    anchor_stds: Sequence[float] = (0.07, 0.07, 0.14, 0.14)
    bbox_beta: float = 1.0

    @nn.compact
    def __call__(self, feats, training: bool = False):
        rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                           kernel_init=normal_init(0.01), name="rpn_conv")
        conv_loc = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), kernel_init=normal_init(0.01),
                             name="conv_shape")
        adapt = FeatureAdaption(self.feat_channels, name="feature_adaption")
        conv_cls = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                           name="conv_cls")
        conv_reg = nn.Conv(4, (1, 1), kernel_init=normal_init(0.01),
                           name="conv_reg")
        cls_scores, bbox_preds, shape_preds, loc_preds = [], [], [], []
        for x in feats:
            x = nn.relu(rpn_conv(x))
            loc = conv_loc(x)
            shape = conv_shape(x)
            x = adapt(x, shape)
            cls_scores.append(conv_cls(x))
            bbox_preds.append(conv_reg(x))
            shape_preds.append(shape)
            loc_preds.append(loc)
        return (tuple(cls_scores), tuple(bbox_preds), tuple(shape_preds),
                tuple(loc_preds))


def ga_rpn_loss(head: GARPNHead, outputs, batch, axis_name=None):
    """Loc + shape + class-agnostic BCE/smooth-L1 on guided anchors."""
    cls_scores, bbox_preds, shape_preds, loc_preds = outputs
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    squares = head.make_square_generator().flat_anchors(featmap_sizes)
    gen = head.make_approx_generator()
    g = gen.num_base_anchors
    approxs = jnp.concatenate(
        [lvl.reshape(-1, g, 4) for lvl in gen.grid_anchors(featmap_sizes)],
        axis=0)
    b = cls_scores[0].shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1) for c in cls_scores], axis=1)
    flat_reg = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1)
    flat_shape = jnp.concatenate(
        [s.reshape(b, -1, 2) for s in shape_preds], axis=1)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    from dsl_tpu.models.dense_heads.ga_retina_head import (
        _resolve_ga_cfgs, _shape_decoded_anchors)

    cfg = _resolve_ga_cfgs(head)

    # ---- allowed_border anchor filtering (anchor_inside_flags) ----
    # rpn train_cfg has allowed_border=0: approx positions / guided anchors
    # sticking out of the image are excluded from assignment entirely
    # (``get_sampled_approxs`` :239-287 + AnchorHead._get_targets_single).
    border = float(head.allowed_border)
    approx_inside = None
    if border >= 0 and batch.get("img_shapes") is not None:
        hw = batch["img_shapes"]                           # (B, 2) [h, w]

        def _inside(boxes, hw_i):
            return ((boxes[..., 0] >= -border)
                    & (boxes[..., 1] >= -border)
                    & (boxes[..., 2] < hw_i[1] + border)
                    & (boxes[..., 3] < hw_i[0] + border))

        # a square position is valid if ANY of its G approxs is inside
        approx_inside = jax.vmap(
            lambda hw_i: jnp.any(_inside(approxs, hw_i), axis=1))(hw)

    loc_tw, loc_avg = _loc_targets(head, batch["gt_bboxes"],
                                   batch["gt_valid"], featmap_sizes)
    loss_loc = 0.0
    for lvl, (t, wgt) in enumerate(loc_tw):
        logits = loc_preds[lvl].reshape(b, -1, 1)
        # center map fed as class indices — see ga_retina_loss loc note
        labels = t.reshape(b, -1).astype(jnp.int32)
        loss_loc = loss_loc + cfg["loc_lw"] * L.sigmoid_focal_loss(
            logits, labels, gamma=cfg["loc_gamma"], alpha=cfg["loc_alpha"],
            weight=wgt.reshape(b, -1), avg_factor=loc_avg)

    s_labels, s_assigned, s_weights, _ = approx_max_iou_assign(
        approxs, batch["gt_bboxes"],
        jnp.zeros_like(batch["gt_labels"]), batch["gt_valid"],
        pos_iou_thr=head.ga_pos_iou_thr, neg_iou_thr=head.ga_neg_iou_thr,
        min_pos_iou=head.ga_min_pos_iou, num_classes=1,
        inside=approx_inside)
    s_pos = (s_labels < 1).astype(jnp.float32)
    # RandomSampler(num, pos_fraction) count semantics (see ga_retina_loss);
    # negatives are capped by the AVAILABLE below-neg-thr inside positions
    pos_per_img = s_pos.sum(axis=1)
    avail_neg = ((s_weights > 0) & (s_labels == 1)).astype(
        jnp.float32).sum(axis=1)
    kept_pos = jnp.minimum(pos_per_img,
                           float(int(head.ga_sample_num
                                     * head.ga_pos_fraction)))
    kept_neg = jnp.minimum(head.ga_sample_num - kept_pos, avail_neg)
    anchor_total = _psum(jnp.maximum(pos_per_img, 1.0).sum()
                         + jnp.maximum(kept_neg, 1.0).sum())
    gt_s = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(s_assigned, 0)[..., None], axis=1)
    pred_anchors = _shape_decoded_anchors(squares, flat_shape,
                                          cfg["anchor_stds"])
    loss_shape = cfg["shape_lw"] * L.bounded_iou_loss(
        pred_anchors, gt_s, beta=cfg["shape_beta"], weight=s_pos[..., None],
        reduction="mean", avg_factor=anchor_total)

    ga = _guided_anchors(head, squares, flat_shape, cfg["anchor_stds"])
    cls_inside = None
    if approx_inside is not None:
        # effective flags: approx-position validity AND the guided anchor
        # itself inside (AnchorHead._get_targets_single re-checks)
        ga_inside = jax.vmap(_inside)(ga, batch["img_shapes"])
        cls_inside = approx_inside & ga_inside
    labels, assigned, weights, _ = jax.vmap(
        lambda a, gb, gl, gv, ins: _max_iou_assign_single(
            a, gb, gl, gv, pos_iou_thr=head.pos_iou_thr,
            neg_iou_thr=head.neg_iou_thr, min_pos_iou=head.min_pos_iou,
            num_classes=1, match_low_quality=True, inside=ins))(
        ga, batch["gt_bboxes"], jnp.zeros_like(batch["gt_labels"]),
        batch["gt_valid"],
        cls_inside if cls_inside is not None
        else jnp.ones(ga.shape[:2], bool))
    pos = labels < 1
    posf = pos.astype(jnp.float32)
    num = jnp.maximum(_psum((weights > 0).astype(jnp.float32).sum()), 1.0)
    loss_cls = L.binary_cross_entropy(
        flat_cls, posf, weight=weights, reduction="mean", avg_factor=num)
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
    deltas = jax.vmap(lambda a, g_: bbox2delta(a, g_, cfg["means"],
                                               cfg["stds"]))(ga, gt)
    # sampling head: bbox avg_factor is num_total_samples = pos + neg,
    # same as cls (AnchorHead.loss_single with CrossEntropy cls)
    loss_bbox = L.smooth_l1_loss(flat_reg, deltas, beta=cfg["bbox_beta"],
                                 weight=posf[..., None], avg_factor=num)
    return dict(loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_bbox,
                loss_anchor_shape=loss_shape, loss_anchor_loc=loss_loc)


def ga_rpn_proposals(head: GARPNHead, outputs, img_shapes=None,
                     nms_pre: int = 1000, num_proposals: int = 1000,
                     iou_threshold: float = 0.7, nms_post: int = 1000):
    """Guided anchors + loc filter -> decoded proposals, NMS PER LEVEL
    (capped at ``nms_post`` each), concat, top ``num_proposals`` by score
    (``ga_rpn_head.py _get_bboxes_single:114-176``,
    ``nms_across_levels=False`` default)."""
    cls_scores, bbox_preds, shape_preds, loc_preds = outputs
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    lvl_squares = head.make_square_generator().grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]
    boxes_all, scores_all = [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.sigmoid(cls_scores[lvl].reshape(b, -1))
        loc = jax.nn.sigmoid(loc_preds[lvl].reshape(b, -1))
        scores = jnp.where(loc >= head.loc_filter_thr, scores, 0.0)
        reg = bbox_preds[lvl].reshape(b, -1, 4)
        shape = shape_preds[lvl].reshape(b, -1, 2)
        ga = _guided_anchors(head, lvl_squares[lvl], shape)
        k = min(nms_pre, scores.shape[1])
        _, top = jax.lax.top_k(scores, k)
        take = lambda a: jnp.take_along_axis(
            a, top.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
        scores, reg, ga = take(scores), take(reg), take(ga)
        boxes = delta2bbox(ga, reg, head.target_means, head.target_stds)
        if img_shapes is not None:
            xlim = img_shapes[:, None, 1:2]
            ylim = img_shapes[:, None, 0:1]
            boxes = jnp.concatenate(
                [jnp.clip(boxes[..., 0:1], 0, xlim),
                 jnp.clip(boxes[..., 1:2], 0, ylim),
                 jnp.clip(boxes[..., 2:3], 0, xlim),
                 jnp.clip(boxes[..., 3:4], 0, ylim)], axis=-1)
        # per-level NMS capped at nms_post (reference :161-164)
        post = min(nms_post, boxes.shape[1])

        def _lvl(bx, sc):
            dets, _, valid = nms(bx, sc, iou_threshold=iou_threshold,
                                 max_out=post)
            return dets[:, :4], dets[:, 4], valid

        lb, ls, lv = jax.vmap(_lvl)(boxes, scores)
        boxes_all.append(lb)
        scores_all.append(jnp.where(lv, ls, NEG_INF))
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    # concat + top num_proposals by score (no cross-level NMS)
    k = min(num_proposals, scores.shape[1])
    top_sc, top_idx = jax.lax.top_k(scores, k)
    out_boxes = jnp.take_along_axis(
        boxes, top_idx[..., None].repeat(4, -1), axis=1)
    valid = top_sc > NEG_INF / 2
    return (jnp.where(valid[..., None], out_boxes, 0.0),
            jnp.where(valid, top_sc, 0.0), valid)
