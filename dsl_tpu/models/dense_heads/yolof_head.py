"""YOLOF: single-level detection with a dilated encoder + uniform matching.

Parity with ``/root/reference/mmdet/models/necks/dilated_encoder.py`` (1x1
lateral + 3x3 fpn conv + 4 dilated residual blocks, dilations 2/4/6/8) and
``mmdet/models/dense_heads/yolof_head.py`` (2-conv cls subnet, 4-conv reg
subnet with an implicit-objectness branch folded into the cls score via the
log-sum-exp normalization) + ``core/bbox/assigners/uniform_assigner.py``
(each GT takes the ``match_times`` closest anchors AND closest predicted
boxes by center L1; positives with pred-IoU < 0.15 ignored, negatives with
pred-IoU > 0.7 ignored); focal cls + GIoU reg.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS, MODELS
from dsl_tpu.core import losses as L
from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.boxes import bbox_overlaps, delta2bbox
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import (FrozenBatchNorm, bias_init_with_prob,
                                   normal_init)


@MODELS.register
class DilatedEncoder(nn.Module):
    in_channels: int = 2048
    out_channels: int = 512
    block_mid_channels: int = 128
    num_residual_blocks: int = 4
    block_dilations: Sequence[int] = (2, 4, 6, 8)

    @nn.compact
    def __call__(self, feats):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        x = nn.Conv(self.out_channels, (1, 1), name="lateral_conv")(x)
        x = FrozenBatchNorm(name="lateral_bn")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, name="fpn_conv")(x)
        x = FrozenBatchNorm(name="fpn_bn")(x)
        for i, d in enumerate(self.block_dilations[
                :self.num_residual_blocks]):
            y = nn.relu(FrozenBatchNorm(name=f"b{i}_bn1")(
                nn.Conv(self.block_mid_channels, (1, 1),
                        name=f"b{i}_conv1")(x)))
            y = nn.relu(FrozenBatchNorm(name=f"b{i}_bn2")(
                nn.Conv(self.block_mid_channels, (3, 3), padding=d,
                        kernel_dilation=(d, d), name=f"b{i}_conv2")(y)))
            y = nn.relu(FrozenBatchNorm(name=f"b{i}_bn3")(
                nn.Conv(self.out_channels, (1, 1), name=f"b{i}_conv3")(y)))
            x = x + y
        return (x,)


@HEADS.register
class YOLOFHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 4
    strides: Sequence[int] = (32,)
    anchor_scales: Sequence[float] = (1, 2, 4, 8, 16)
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    match_times: int = 4
    pos_ignore_thr: float = 0.15
    neg_ignore_thr: float = 0.7
    # YOLOF decodes with the ctr-clamped delta coder (config bbox_coder
    # add_ctr_clamp=True, ctr_clamp=32)
    add_ctr_clamp: bool = True
    ctr_clamp: float = 32.0
    loss_cls: dict | None = None
    loss_bbox: dict | None = None

    def make_anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=list(self.strides), ratios=(1.0,),
                               scales=list(self.anchor_scales))

    @nn.compact
    def __call__(self, feats, training: bool = False):
        x = feats[0] if isinstance(feats, (tuple, list)) else feats
        na = len(self.anchor_scales)
        cf = x
        for i in range(self.num_cls_convs):
            cf = nn.relu(FrozenBatchNorm(name=f"cls_bn{i}")(
                nn.Conv(self.in_channels, (3, 3), padding=1,
                        kernel_init=normal_init(0.01),
                        name=f"cls_conv{i}")(cf)))
        cls_score = nn.Conv(na * self.num_classes, (3, 3), padding=1,
                            kernel_init=normal_init(0.01),
                            bias_init=bias_init_with_prob(0.01),
                            name="cls_score")(cf)
        rf = x
        for i in range(self.num_reg_convs):
            rf = nn.relu(FrozenBatchNorm(name=f"reg_bn{i}")(
                nn.Conv(self.in_channels, (3, 3), padding=1,
                        kernel_init=normal_init(0.01),
                        name=f"reg_conv{i}")(rf)))
        bbox_pred = nn.Conv(na * 4, (3, 3), padding=1,
                            kernel_init=normal_init(0.01),
                            name="bbox_pred")(rf)
        objectness = nn.Conv(na, (3, 3), padding=1,
                             kernel_init=normal_init(0.01),
                             name="object_pred")(rf)
        # implicit objectness folded into the cls score (yolof_head.py
        # forward_single normalization)
        b, h, w, _ = cls_score.shape
        cs = cls_score.reshape(b, h, w, na, self.num_classes)
        ob = objectness.reshape(b, h, w, na, 1)
        norm = cs + ob - jnp.log(
            1.0 + jnp.clip(jnp.exp(cs), a_max=1e8)
            + jnp.clip(jnp.exp(ob), a_max=1e8))
        return (norm.reshape(b, h, w, na * self.num_classes),), \
            (bbox_pred,)


def yolof_loss(head: YOLOFHead, cls_scores, bbox_preds, batch,
               axis_name: str | None = None):
    """Uniform matching, the reference's exact machinery
    (``yolof_head.py:219-344`` + ``uniform_assigner.py:34-138``):

    - cost is the **cxcywh** L1 ``cdist`` (centers AND sizes), computed for
      both the ctr-clamp-decoded predictions and the raw anchors; each gt
      takes the ``match_times`` smallest of each — the candidate list keeps
      duplicates, exactly like ``indexes = cat(index, index1)``;
    - a candidate is pos-ignored when its **anchor** IoU (not pred IoU)
      with its gt is < ``pos_ignore_thr``;
    - the per-anchor label scatter is sequential last-wins in the
      reference's flattened (match-rank-major, pred-block-then-anchor-
      block, gt-minor) order — emulated with an ordinal scatter-max;
    - the GIoU bbox loss runs over the full duplicated candidate list
      (``bbox_pred[indexes]`` vs ``gt_bboxes[pos_gt_index]``), NOT over
      unique anchors, averaged by the number of unique positive anchors.
    """
    nc = head.num_classes
    gen = head.make_anchor_generator()
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = jnp.asarray(gen.flat_anchors(shapes))          # (A, 4)
    a = anchors.shape[0]
    b = cls_scores[0].shape[0]
    flat_cls = cls_scores[0].reshape(b, -1, nc)
    flat_reg = bbox_preds[0].reshape(b, -1, 4)
    decoded = delta2bbox(anchors[None], flat_reg, head.target_means,
                         head.target_stds,
                         add_ctr_clamp=head.add_ctr_clamp,
                         ctr_clamp=head.ctr_clamp)

    gt = batch["gt_bboxes"]
    gtl = jnp.clip(batch["gt_labels"], 0, nc - 1)
    gtv = batch["gt_valid"]
    k = gt.shape[1]
    t = min(head.match_times, a)
    n_ent = 2 * t * k

    def cxcywh(boxes):
        return jnp.stack([(boxes[..., 0] + boxes[..., 2]) / 2,
                          (boxes[..., 1] + boxes[..., 3]) / 2,
                          boxes[..., 2] - boxes[..., 0],
                          boxes[..., 3] - boxes[..., 1]], axis=-1)

    def per_image(dec, g, gl, gv):
        # costs (A, K) in cxcywh space
        cost_p = jnp.abs(cxcywh(dec)[:, None] - cxcywh(g)[None]).sum(-1)
        cost_a = jnp.abs(cxcywh(anchors)[:, None] - cxcywh(g)[None]).sum(-1)
        idx_p = jax.lax.top_k(-cost_p.T, t)[1].T             # (t, K)
        idx_a = jax.lax.top_k(-cost_a.T, t)[1].T             # (t, K)
        # reference order: cat((index, index1), dim=1).reshape(-1)
        flat = jnp.concatenate([idx_p, idx_a], axis=1).reshape(-1)  # (2tK,)
        gt_of = jnp.tile(jnp.arange(k), 2 * t)                      # (2tK,)

        iou_pred = bbox_overlaps(dec, g)                     # (A, K)
        iou_anchor = bbox_overlaps(anchors, g)               # (A, K)
        pos_ious = iou_anchor[flat, gt_of]
        ent_ignore = pos_ious < head.pos_ignore_thr
        ent_valid = gv[gt_of]

        # base assignment: 0 (background), -1 where pred IoU to any valid
        # gt exceeds neg_ignore_thr
        pred_max = jnp.max(jnp.where(gv[None], iou_pred, -1.0), axis=-1)
        base = jnp.where(pred_max > head.neg_ignore_thr, -1, 0)

        # last-wins sequential scatter of entry values
        ent_value = jnp.where(ent_ignore, -1, gt_of + 1)
        ord_ = jnp.arange(n_ent)
        win = jnp.full((a,), -1, jnp.int32).at[flat].max(
            jnp.where(ent_valid, ord_, -1))
        assigned = jnp.where(win >= 0, ent_value[jnp.maximum(win, 0)], base)

        labels = jnp.where(assigned > 0, gl[jnp.maximum(assigned - 1, 0)],
                           nc)
        label_w = (assigned >= 0).astype(jnp.float32)
        num_pos = (assigned > 0).sum().astype(jnp.float32)

        ent_pred = dec[flat]                                 # (2tK, 4)
        ent_tgt = g[gt_of]
        ent_w = ((~ent_ignore) & ent_valid).astype(jnp.float32)
        return labels, label_w, num_pos, ent_pred, ent_tgt, ent_w

    labels, label_w, num_pos, ent_pred, ent_tgt, ent_w = jax.vmap(
        per_image)(decoded, gt, gtl, gtv)

    total_pos = num_pos.sum()
    if axis_name:
        total_pos = jax.lax.psum(total_pos, axis_name)
    num_total = jnp.maximum(total_pos, 1.0)

    cls_cfg = dict(head.loss_cls or {})
    bbox_cfg = dict(head.loss_bbox or {})
    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * L.sigmoid_focal_loss(
        flat_cls, labels, gamma=float(cls_cfg.get("gamma", 2.0)),
        alpha=float(cls_cfg.get("alpha", 0.25)), weight=label_w,
        avg_factor=num_total)
    loss_bbox = float(bbox_cfg.get("loss_weight", 1.0)) * L.giou_loss(
        ent_pred, ent_tgt, weight=ent_w, avg_factor=num_total)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def yolof_get_bboxes(head: YOLOFHead, cls_scores, bbox_preds,
                     img_shapes=None, scale_factors=None, nms_pre=1000,
                     score_thr=0.05, iou_threshold=0.6, max_per_img=100):
    nc = head.num_classes
    gen = head.make_anchor_generator()
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = jnp.asarray(gen.flat_anchors(shapes))
    b = cls_scores[0].shape[0]
    scores = jax.nn.sigmoid(cls_scores[0].reshape(b, -1, nc))
    boxes = delta2bbox(anchors[None], bbox_preds[0].reshape(b, -1, 4),
                       head.target_means, head.target_stds,
                       add_ctr_clamp=head.add_ctr_clamp,
                       ctr_clamp=head.ctr_clamp)
    if img_shapes is not None:
        xlim = img_shapes[:, None, 1:2]
        ylim = img_shapes[:, None, 0:1]
        boxes = jnp.concatenate(
            [jnp.clip(boxes[..., 0:1], 0, xlim),
             jnp.clip(boxes[..., 1:2], 0, ylim),
             jnp.clip(boxes[..., 2:3], 0, xlim),
             jnp.clip(boxes[..., 3:4], 0, ylim)], axis=-1)
    kk = min(nms_pre, scores.shape[1])
    rank = jnp.max(scores, axis=-1)
    _, idx = jax.lax.top_k(rank, kk)
    take = lambda x: jnp.take_along_axis(
        x, idx.reshape(b, kk, *(1,) * (x.ndim - 2)), axis=1)
    boxes, scores = take(boxes), take(scores)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc):
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img)

    return jax.vmap(_single)(boxes, scores)
