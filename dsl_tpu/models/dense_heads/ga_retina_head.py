"""Guided Anchoring: GA-RetinaNet head.

Parity with ``/root/reference/mmdet/models/dense_heads/guided_anchor_head.py:
14-858`` (FeatureAdaption DCN driven by the shape prediction, loc branch
with center/ignore-region targets (``ga_loc_targets`` :374-476,
``calc_region`` in ``core/anchor/utils.py:49-65``), ApproxMaxIoU shape
targets + BoundedIoU shape loss (:477-627), cls/bbox losses on the guided
anchors) and ``ga_retina_head.py:10-112`` (separate cls/reg adaption).

TPU redesign: every target is a dense per-pixel/per-anchor masked array
built by a ``lax.scan`` over the K-padded GT slots; the reference's
MaskedConv2d test-time optimization is replaced by dense convs with the
loc-filter applied to the decoded scores (dense conv is faster on the MXU
than gather/scatter masking).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.assigners import (_max_iou_assign_single,
                                    approx_max_iou_assign)
from dsl_tpu.core.boxes import bbox2delta, delta2bbox
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import bias_init_with_prob, normal_init
from dsl_tpu.ops.deform_conv import deform_conv2d


class FeatureAdaption(nn.Module):
    """DCN whose offsets come from the (detached) shape prediction
    (reference ``guided_anchor_head.py:14-56``, deform_groups folded to 1)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, shape_pred):
        off = nn.Conv(18, (1, 1), use_bias=False,
                      kernel_init=normal_init(0.1), name="conv_offset")(
                          jax.lax.stop_gradient(shape_pred))
        w = self.param("adapt_kernel", normal_init(0.01),
                       (3, 3, x.shape[-1], self.out_channels))
        return nn.relu(deform_conv2d(x, off, w))


@HEADS.register
class GARetinaHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    loc_filter_thr: float = 0.01
    # train_cfg parity (reference ga_retinanet_r50_caffe_fpn_1x_coco.py)
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    ga_pos_iou_thr: float = 0.5
    ga_neg_iou_thr: float = 0.4
    ga_min_pos_iou: float = 0.4
    ga_sample_num: int = 256       # RandomSampler(num=256, pos_fraction=.5)
    ga_pos_fraction: float = 0.5
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0
    allowed_border: float = -1.0
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    anchor_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    bbox_beta: float = 0.04
    # config-parity fields
    approx_anchor_generator: dict | None = None
    square_anchor_generator: dict | None = None
    anchor_coder: dict | None = None
    bbox_coder: dict | None = None
    loss_loc: dict | None = None
    loss_shape: dict | None = None
    loss_cls: dict | None = None
    loss_bbox: dict | None = None

    def make_square_generator(self) -> AnchorGenerator:
        cfg = dict(self.square_anchor_generator or {})
        return AnchorGenerator(
            strides=cfg.get("strides", list(self.strides)),
            ratios=cfg.get("ratios", [1.0]),
            octave_base_scale=cfg.get("scales",
                                      [self.octave_base_scale])[0],
            scales_per_octave=1)

    def make_approx_generator(self) -> AnchorGenerator:
        cfg = dict(self.approx_anchor_generator or {})
        return AnchorGenerator(
            strides=cfg.get("strides", list(self.strides)),
            ratios=cfg.get("ratios", list(self.anchor_ratios)),
            octave_base_scale=cfg.get("octave_base_scale",
                                      self.octave_base_scale),
            scales_per_octave=cfg.get("scales_per_octave",
                                      self.scales_per_octave))

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
        conv_loc = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), kernel_init=normal_init(0.01),
                             name="conv_shape")
        adapt_cls = FeatureAdaption(self.feat_channels, name="adapt_cls")
        adapt_reg = FeatureAdaption(self.feat_channels, name="adapt_reg")
        retina_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                             kernel_init=normal_init(0.01),
                             bias_init=bias_init_with_prob(0.01),
                             name="retina_cls")
        retina_reg = nn.Conv(4, (3, 3), padding=1,
                             kernel_init=normal_init(0.01),
                             name="retina_reg")
        cls_scores, bbox_preds, shape_preds, loc_preds = [], [], [], []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            loc = conv_loc(cf)
            shape = conv_shape(rf)
            cf = adapt_cls(cf, shape)
            rf = adapt_reg(rf, shape)
            cls_scores.append(retina_cls(cf))
            bbox_preds.append(retina_reg(rf))
            shape_preds.append(shape)
            loc_preds.append(loc)
        return (tuple(cls_scores), tuple(bbox_preds), tuple(shape_preds),
                tuple(loc_preds))


def _resolve_ga_cfgs(head):
    """Pull the coder stds / loss hyperparams out of the config-parity dicts
    (reference builds them via ``build_bbox_coder``/``build_loss``,
    ``guided_anchor_head.py:176-183``); head-field defaults otherwise."""
    anchor_stds = tuple((head.anchor_coder or {}).get(
        "target_stds", head.anchor_stds))
    bc = head.bbox_coder or {}
    means = tuple(bc.get("target_means", head.target_means))
    stds = tuple(bc.get("target_stds", head.target_stds))
    lb = head.loss_bbox or {}
    bbox_beta = lb.get("beta", head.bbox_beta)
    bbox_lw = lb.get("loss_weight", 1.0)
    lc = head.loss_cls or {}
    cls_gamma = lc.get("gamma", 2.0)
    cls_alpha = lc.get("alpha", 0.25)
    cls_lw = lc.get("loss_weight", 1.0)
    ls = head.loss_shape or {}
    shape_beta = ls.get("beta", 0.2)
    shape_lw = ls.get("loss_weight", 1.0)
    ll = head.loss_loc or {}
    loc_gamma = ll.get("gamma", 2.0)
    loc_alpha = ll.get("alpha", 0.25)
    loc_lw = ll.get("loss_weight", 1.0)
    return dict(anchor_stds=anchor_stds, means=means, stds=stds,
                bbox_beta=bbox_beta, bbox_lw=bbox_lw, cls_gamma=cls_gamma,
                cls_alpha=cls_alpha, cls_lw=cls_lw, shape_beta=shape_beta,
                shape_lw=shape_lw, loc_gamma=loc_gamma, loc_alpha=loc_alpha,
                loc_lw=loc_lw)


# delta2bbox's wh_ratio_clip=1e-6 used by the anchor decode (reference
# ``_get_guided_anchors_single`` :340-372 and ``loss_shape_single`` :605-627)
_MAX_RATIO = abs(math.log(1e-6))


def _shape_decoded_anchors(squares, shape_flat, anchor_stds):
    """squares (A, 4) + predicted (dw, dh) -> anchors (B, A, 4): the
    reference's ``anchor_coder.decode`` with dxy=0 and std-scaled dwh."""
    sw = (squares[:, 2] - squares[:, 0])[None]
    sh = (squares[:, 3] - squares[:, 1])[None]
    cx = ((squares[:, 0] + squares[:, 2]) * 0.5)[None]
    cy = ((squares[:, 1] + squares[:, 3]) * 0.5)[None]
    dw = jnp.clip(shape_flat[..., 0] * anchor_stds[2], -_MAX_RATIO,
                  _MAX_RATIO)
    dh = jnp.clip(shape_flat[..., 1] * anchor_stds[3], -_MAX_RATIO,
                  _MAX_RATIO)
    w = sw * jnp.exp(dw)
    h = sh * jnp.exp(dh)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def _guided_anchors(head, squares, shape_flat, anchor_stds=None):
    """Guided anchors: stop-gradient shape decode (reference
    ``_get_guided_anchors_single`` :340-372)."""
    if anchor_stds is None:
        anchor_stds = _resolve_ga_cfgs(head)["anchor_stds"]
    return _shape_decoded_anchors(squares,
                                  jax.lax.stop_gradient(shape_flat),
                                  anchor_stds)


def _loc_targets(head, gt_bboxes, gt_valid, featmap_sizes):
    """Dense center/ignore-region loc targets (reference ``ga_loc_targets``
    :374-476). Returns per-level (targets (B,H,W), weights (B,H,W)) and the
    global avg factor."""
    strides = [s if isinstance(s, (int, float)) else s[0]
               for s in head.make_square_generator().strides]
    num_lvls = len(featmap_sizes)
    r1 = (1 - head.center_ratio) / 2
    r2 = (1 - head.ignore_ratio) / 2
    scale = jnp.sqrt(jnp.maximum(
        (gt_bboxes[..., 2] - gt_bboxes[..., 0])
        * (gt_bboxes[..., 3] - gt_bboxes[..., 1]), 1e-6))
    min_size = head.octave_base_scale * strides[0]
    tgt_lvl = jnp.clip(jnp.floor(
        jnp.log2(scale) - math.log2(min_size) + 0.5), 0, num_lvls - 1)

    def region_mask(box, ratio, h, w):
        x1 = jnp.round((1 - ratio) * box[0] + ratio * box[2])
        y1 = jnp.round((1 - ratio) * box[1] + ratio * box[3])
        x2 = jnp.round(ratio * box[0] + (1 - ratio) * box[2])
        y2 = jnp.round(ratio * box[1] + (1 - ratio) * box[3])
        x1 = jnp.clip(x1, 0, w - 1)
        y1 = jnp.clip(y1, 0, h - 1)
        x2 = jnp.clip(x2, 0, w - 1)
        y2 = jnp.clip(y2, 0, h - 1)
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        return ((ys >= y1) & (ys <= y2) & (xs >= x1) & (xs <= x2))

    out = []
    total = 0.0
    for lvl in range(num_lvls):
        h, w = featmap_sizes[lvl]
        stride = strides[lvl]

        def per_image(boxes, valid, lvls):
            # reference order matters (torch-oracled): per gt IN ORDER,
            # weight[ignore_region] = 0 then weight[center_region] = 1 —
            # a later gt's ignore region zeroes an earlier gt's center
            # weight (its target stays 1); the adjacent-level ignore map
            # only zeroes cells no same-level region ever touched (w < 0)
            def body(carry, j):
                t, wcur, igmap = carry
                box = boxes[j] / stride
                at_lvl = (lvls[j] == lvl) & (valid[j] > 0)
                adj = (jnp.abs(lvls[j] - lvl) == 1) & (valid[j] > 0)
                c = region_mask(box, r1, h, w) & at_lvl
                ig = region_mask(box, r2, h, w) & at_lvl
                wcur = jnp.where(ig, 0.0, wcur)
                wcur = jnp.where(c, 1.0, wcur)
                igmap = igmap | (region_mask(box, r2, h, w) & adj)
                return (t | c, wcur, igmap), None

            (t, wcur, igmap), _ = jax.lax.scan(
                body, (jnp.zeros((h, w), bool),
                       jnp.full((h, w), -1.0, jnp.float32),
                       jnp.zeros((h, w), bool)),
                jnp.arange(boxes.shape[0]))
            wgt = jnp.where((wcur < 0) & igmap, 0.0,
                            jnp.where(wcur < 0, 0.1, wcur))
            return t.astype(jnp.float32), wgt

        t, wgt = jax.vmap(per_image)(gt_bboxes,
                                     gt_valid.astype(jnp.float32), tgt_lvl)
        out.append((t, wgt))
        total += gt_bboxes.shape[0] * h * w
    return out, total / 200.0


def ga_retina_loss(head, outputs, batch, axis_name=None):
    cls_scores, bbox_preds, shape_preds, loc_preds = outputs
    nc = head.num_classes
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    squares = head.make_square_generator().flat_anchors(featmap_sizes)
    gen = head.make_approx_generator()
    g = gen.num_base_anchors
    approxs = jnp.concatenate(
        [lvl.reshape(-1, g, 4) for lvl in gen.grid_anchors(featmap_sizes)],
        axis=0)

    b = cls_scores[0].shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    flat_reg = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1)
    flat_shape = jnp.concatenate(
        [s.reshape(b, -1, 2) for s in shape_preds], axis=1)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    cfg = _resolve_ga_cfgs(head)

    # ---- loc loss (focal on the single-logit objectness map) ----
    loc_tw, loc_avg = _loc_targets(head, batch["gt_bboxes"],
                                   batch["gt_valid"], featmap_sizes)
    loss_loc = 0.0
    for lvl, (t, wgt) in enumerate(loc_tw):
        logits = loc_preds[lvl].reshape(b, -1, 1)
        # reference quirk (torch-oracled): ``loss_loc_single`` :629-636
        # feeds the 0/1 center map to FocalLoss as *class indices*, so a
        # center (1 == num_classes) is one-hot BACKGROUND for the single
        # logit and the off-center 0s are the "positive" class
        labels = t.reshape(b, -1).astype(jnp.int32)
        loss_loc = loss_loc + cfg["loc_lw"] * L.sigmoid_focal_loss(
            logits, labels, gamma=cfg["loc_gamma"], alpha=cfg["loc_alpha"],
            weight=wgt.reshape(b, -1), avg_factor=loc_avg)

    # ---- shape loss (BoundedIoU on the best-shape anchors) ----
    s_labels, s_assigned, s_weights, _ = approx_max_iou_assign(
        approxs, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
        pos_iou_thr=head.ga_pos_iou_thr, neg_iou_thr=head.ga_neg_iou_thr,
        min_pos_iou=head.ga_min_pos_iou, num_classes=nc)
    s_pos = (s_labels < nc).astype(jnp.float32)
    # reference: RandomSampler(num, pos_fraction) over the shape candidates;
    # anchor_total_num = sum_i max(pos_i, 1) + sum_i max(neg_i, 1) with
    # neg_i = min(num - kept_pos_i, available below-neg-thr candidates)
    # (``ga_shape_targets`` :594-595 with ``loss`` :671-675). The random
    # *choice* never enters the loss (bbox_weights are pos-only), only the
    # deterministic counts do.
    pos_per_img = s_pos.sum(axis=1)
    avail_neg = ((s_weights > 0) & (s_labels == nc)).astype(
        jnp.float32).sum(axis=1)
    kept_pos = jnp.minimum(pos_per_img,
                           float(int(head.ga_sample_num
                                     * head.ga_pos_fraction)))
    kept_neg = jnp.minimum(head.ga_sample_num - kept_pos, avail_neg)
    anchor_fg = jnp.maximum(pos_per_img, 1.0).sum()
    anchor_bg = jnp.maximum(kept_neg, 1.0).sum()
    anchor_total = _psum(anchor_fg + anchor_bg)
    gt_s = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(s_assigned, 0)[..., None], axis=1)
    # predicted anchor (gradient flows through shape pred here)
    pred_anchors = _shape_decoded_anchors(squares, flat_shape,
                                          cfg["anchor_stds"])
    loss_shape = cfg["shape_lw"] * L.bounded_iou_loss(
        pred_anchors, gt_s, beta=cfg["shape_beta"], weight=s_pos[..., None],
        reduction="mean", avg_factor=anchor_total)

    # ---- cls/bbox losses on the guided anchors (per-image anchors) ----
    ga = _guided_anchors(head, squares, flat_shape, cfg["anchor_stds"])
    labels, assigned, weights, _ = jax.vmap(
        lambda a, gb, gl, gv: _max_iou_assign_single(
            a, gb, gl, gv, pos_iou_thr=head.pos_iou_thr,
            neg_iou_thr=head.neg_iou_thr, min_pos_iou=head.min_pos_iou,
            num_classes=nc, match_low_quality=True))(
        ga, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"])
    pos = labels < nc
    # per-image max(1) (reference AnchorHead.get_targets :~ num_total_pos)
    num_pos = _psum(jnp.maximum(
        pos.astype(jnp.float32).sum(axis=1), 1.0).sum())
    loss_cls = cfg["cls_lw"] * L.sigmoid_focal_loss(
        flat_cls, labels, gamma=cfg["cls_gamma"], alpha=cfg["cls_alpha"],
        weight=weights, avg_factor=num_pos)
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
    deltas = jax.vmap(lambda a, g_: bbox2delta(a, g_, cfg["means"],
                                               cfg["stds"]))(ga, gt)
    loss_bbox = cfg["bbox_lw"] * L.smooth_l1_loss(
        flat_reg, deltas, beta=cfg["bbox_beta"],
        weight=pos.astype(jnp.float32)[..., None], avg_factor=num_pos)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_shape=loss_shape, loss_loc=loss_loc)


def ga_retina_get_bboxes(head, outputs, img_shapes=None, scale_factors=None,
                         nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                         max_per_img=100):
    """Guided anchors + loc filter + delta decode + multiclass NMS
    (reference ``get_bboxes`` :745-858)."""
    cls_scores, bbox_preds, shape_preds, loc_preds = outputs
    nc = head.num_classes
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    lvl_squares = head.make_square_generator().grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]

    boxes_all, scores_all = [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.sigmoid(cls_scores[lvl].reshape(b, -1, nc))
        loc = jax.nn.sigmoid(loc_preds[lvl].reshape(b, -1, 1))
        scores = jnp.where(loc >= head.loc_filter_thr, scores, 0.0)
        reg = bbox_preds[lvl].reshape(b, -1, 4)
        shape = shape_preds[lvl].reshape(b, -1, 2)
        ga = _guided_anchors(head, lvl_squares[lvl], shape)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, top = jax.lax.top_k(rank, k)
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
