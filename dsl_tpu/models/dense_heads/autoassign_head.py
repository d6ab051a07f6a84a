"""AutoAssign: fully differentiable label assignment (CVPR 2020).

Parity with ``/root/reference/mmdet/models/dense_heads/autoassign_head.py``:
FCOS towers with an implicit-objectness branch instead of centerness, a
learnable per-class CenterPrior (mean/sigma over stride-normalized offsets,
``:17-122``), the positive bag loss with ``exp(3·p)`` confidence weighting
(``get_pos_loss_single`` :214-256), the IoU-decayed negative focal loss
(``get_neg_loss_single`` :258-311), and the center-prior regularizer.

TPU redesign: the reference loops per image / per gt with index gathers;
here everything is dense masked arithmetic over the K-padded GT arrays —
(B, P, K) pair tensors with validity masks, a scatter-min for the per-class
negative weights, and psum'd normalizers for multi-chip parity with
``reduce_mean``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core.boxes import bbox_overlaps, distance2bbox
from dsl_tpu.core.points import MlvlPointGenerator
from dsl_tpu.models.layers import Scale, bias_init_with_prob, normal_init

EPS = 1e-12


@HEADS.register
class AutoAssignHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    pos_loss_weight: float = 0.25
    neg_loss_weight: float = 0.75
    center_loss_weight: float = 0.75
    point_offset: float = 0.0   # no half-stride shift (``:173-187``)

    @nn.compact
    def __call__(self, feats, training: bool = False):
        """Returns (cls_scores, bbox_preds, objectnesses, prior) per level;
        ``prior`` = (mean (C, 2), sigma (C, 2)) — the learnable CenterPrior
        parameters, consumed by :func:`autoassign_loss`."""
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)
        cls_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1,
                     kernel_init=normal_init(0.01), name=f"cls_conv{i}"),
             gn(f"cls_gn{i}")) for i in range(self.stacked_convs)]
        reg_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1,
                     kernel_init=normal_init(0.01), name=f"reg_conv{i}"),
             gn(f"reg_gn{i}")) for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                           kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1,
                           kernel_init=normal_init(0.01),
                           bias_init=nn.initializers.constant(4.0),
                           name="conv_reg")   # reference init_weights: bias 4
        conv_obj = nn.Conv(1, (3, 3), padding=1,
                           kernel_init=normal_init(0.01),
                           name="conv_centerness")
        scales = [Scale(name=f"scale{i}") for i in range(len(self.strides))]

        prior_mean = self.param("center_prior_mean",
                                nn.initializers.zeros,
                                (self.num_classes, 2))
        prior_sigma = self.param("center_prior_sigma",
                                 nn.initializers.ones,
                                 (self.num_classes, 2))

        cls_scores, bbox_preds, objs = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for conv, norm in cls_convs:
                cls_feat = nn.relu(norm(conv(cls_feat)))
            for conv, norm in reg_convs:
                reg_feat = nn.relu(norm(conv(reg_feat)))
            cls_scores.append(conv_cls(cls_feat))
            # AutoAssign: relu + ×stride in BOTH train and test
            bbox_preds.append(
                nn.relu(scales[lvl](conv_reg(reg_feat))) * self.strides[lvl])
            objs.append(conv_obj(reg_feat))
        return (tuple(cls_scores), tuple(bbox_preds), tuple(objs),
                (prior_mean, prior_sigma))


def _flat(per_level, c):
    return jnp.concatenate(
        [x.reshape(x.shape[0], -1, c) for x in per_level], axis=1)


def autoassign_loss(head, outputs, batch, axis_name=None):
    cls_scores, bbox_preds, objs, (p_mean, p_sigma) = outputs
    shapes = [x.shape[1:3] for x in cls_scores]
    # AutoAssign removes the half-stride offset (reference
    # ``_get_points_single`` :173-187: points = (x·stride, y·stride))
    gen = MlvlPointGenerator(list(head.strides), offset=0.0)
    pts = jnp.asarray(gen.flat_points(shapes))              # (P, 2)
    pt_strides = jnp.concatenate([
        jnp.full((h * w,), float(s))
        for (h, w), s in zip(shapes, head.strides)])         # (P,)

    nc = head.num_classes
    cls = jax.nn.sigmoid(_flat(cls_scores, nc))              # (B, P, C)
    obj = jax.nn.sigmoid(_flat(objs, 1))                     # (B, P, 1)
    bbox = _flat(bbox_preds, 4)                              # (B, P, 4)
    joint = cls * obj                                        # (B, P, C)

    gtb = batch["gt_bboxes"]                                 # (B, K, 4)
    gtl = jnp.clip(batch["gt_labels"], 0, nc - 1)            # (B, K)
    gtv = batch["gt_valid"].astype(jnp.float32)              # (B, K)
    b, k = gtl.shape

    # inside-gt mask (B, P, K) — STRICT inequalities
    # (``_get_target_single``: bbox_targets.min(-1) > 0)
    px = pts[None, :, None, 0]
    py = pts[None, :, None, 1]
    inside = ((px > gtb[:, None, :, 0]) & (px < gtb[:, None, :, 2])
              & (py > gtb[:, None, :, 1]) & (py < gtb[:, None, :, 3])
              & (gtv[:, None, :] > 0))

    # center prior (B, P, K): gaussian of stride-normalized offset to center
    gcx = (gtb[..., 0] + gtb[..., 2]) / 2
    gcy = (gtb[..., 1] + gtb[..., 3]) / 2
    mean = p_mean[gtl]                                       # (B, K, 2)
    sigma = p_sigma[gtl]
    dx = (px - gcx[:, None, :]) / pt_strides[None, :, None] - mean[:, None,
                                                                   :, 0]
    dy = (py - gcy[:, None, :]) / pt_strides[None, :, None] - mean[:, None,
                                                                   :, 1]
    prior = jnp.exp(-(dx * dx) / (2 * sigma[:, None, :, 0] ** 2)) \
        * jnp.exp(-(dy * dy) / (2 * sigma[:, None, :, 1] ** 2))
    prior = jnp.where(inside, prior, 0.0)

    # decoded boxes vs every gt: giou reg loss + iou (B, P, K)
    dec = distance2bbox(pts[None], bbox)                     # (B, P, 4)
    ious_pg = jax.vmap(lambda d, g: bbox_overlaps(d, g))(dec, gtb)
    gious_pg = jax.vmap(
        lambda d, g: bbox_overlaps(d, g, mode="giou"))(dec, gtb)
    reg_loss = 1.0 - gious_pg                                # GIoULoss, none

    # ---- positive bag loss (reference :214-256) ----
    p_loc = jnp.exp(-reg_loss * 5.0)            # loss_bbox loss_weight = 5.0
    p_cls = jnp.take_along_axis(
        joint, gtl[:, None, :], axis=-1)                     # (B, P, K)
    p_pos = jnp.where(inside, p_cls * p_loc, 0.0)
    conf_w = jnp.exp(p_pos * 3.0) * prior
    w = conf_w / jnp.maximum(conf_w.sum(axis=1, keepdims=True), EPS)
    bag = (p_pos * w).sum(axis=1)                            # (B, K)
    pos_loss = -jnp.log(jnp.maximum(bag, EPS)) * gtv
    num_gt = gtv.sum()
    if axis_name:
        num_gt = jax.lax.pmean(num_gt, axis_name)
    pos_loss = head.pos_loss_weight * pos_loss.sum() / jnp.maximum(num_gt, 1)

    # ---- negative focal loss with iou decay (reference :258-311) ----
    # per-point max IoU over ALL (valid) gts, THEN zeroed outside inside
    # (the reference maxes before masking: ``ious.max(dim=-1).repeat`` then
    # ``ious[~inside_gt_bbox_mask] = 0``)
    iou_max = jnp.max(jnp.where(gtv[:, None, :] > 0, ious_pg, 0.0),
                      axis=-1, keepdims=True)                # (B, P, 1)
    ious_b = jnp.where(inside, jnp.broadcast_to(iou_max, inside.shape), 0.0)
    temp = 1.0 / jnp.maximum(1.0 - ious_b, EPS)              # (B, P, K)
    # per-gt min/max over its inside points (masked)
    t_min = jnp.min(jnp.where(inside, temp, jnp.inf), axis=1)   # (B, K)
    t_max = jnp.max(jnp.where(inside, temp, -jnp.inf), axis=1)
    t_min = jnp.where(jnp.isfinite(t_min), t_min, 0.0)
    t_max = jnp.where(jnp.isfinite(t_max), t_max, 1.0)
    t_norm = (temp - t_min[:, None, :] + EPS) / \
        (t_max[:, None, :] - t_min[:, None, :] + EPS)
    neg_val = jnp.where(inside, 1.0 - t_norm, 1.0)           # (B, P, K)
    # scatter into per-class weights (B, P, C): the reference writes
    # ``p_neg_weight[point, gt_label] = 1 - temp_weight`` sequentially in
    # gt-major order, so on (point, class) collisions the LAST gt wins —
    # emulated with an ordinal scatter-max over gt index
    pidx = jnp.broadcast_to(jnp.arange(pts.shape[0])[None, :, None],
                            neg_val.shape)
    lidx = jnp.broadcast_to(gtl[:, None, :], neg_val.shape)
    gidx = jnp.broadcast_to(jnp.arange(k)[None, None, :], neg_val.shape)

    def scatter_last(vals, ins, pi, li, gi):
        win = jnp.full((pts.shape[0], nc), -1, jnp.int32).at[pi, li].max(
            jnp.where(ins, gi, -1))
        picked = jnp.take_along_axis(vals, jnp.maximum(win, 0), axis=1)
        return jnp.where(win >= 0, picked, 1.0)

    neg_w = jax.vmap(scatter_last)(neg_val, inside, pidx, lidx,
                                   gidx)                     # (B, P, C)
    logits = joint * neg_w
    neg_loss_map = logits ** 2 * (-jnp.log(jnp.maximum(1.0 - logits, EPS)))
    neg_avg = prior.sum()
    if axis_name:
        neg_avg = jax.lax.pmean(neg_avg, axis_name)
    neg_loss = head.neg_loss_weight * neg_loss_map.sum() \
        / jnp.maximum(neg_avg, 1.0)

    # ---- center prior regularizer ----
    any_inside = inside.any(axis=(1, 2))                     # (B,)
    per_img = jnp.where(
        any_inside,
        gtv.sum(axis=1) / jnp.maximum(prior.sum(axis=(1, 2)), EPS),
        0.0)
    center_loss = head.center_loss_weight * per_img.mean()

    return dict(loss_pos=pos_loss, loss_neg=neg_loss,
                loss_center=center_loss)


def autoassign_get_bboxes(head, outputs, img_shapes=None, scale_factors=None,
                          nms_pre=1000, score_thr=0.05, iou_threshold=0.6,
                          max_per_img=100):
    """Test decode: score = sigmoid(cls)·sigmoid(obj); boxes already in
    pixels (the head multiplies by stride in both modes)."""
    from dsl_tpu.models.dense_heads.fcos_head import fcos_get_bboxes

    cls_scores, bbox_preds, objs, _ = outputs
    # FCOS decode consumes pixel-space preds (which this head emits in both
    # modes); objectness plays the centerness role in the score product
    return fcos_get_bboxes(head, cls_scores, bbox_preds, objs,
                           img_shapes=img_shapes, scale_factors=scale_factors,
                           nms_pre=nms_pre, score_thr=score_thr,
                           iou_threshold=iou_threshold,
                           max_per_img=max_per_img)
