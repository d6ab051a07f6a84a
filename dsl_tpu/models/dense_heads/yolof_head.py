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
    nc = head.num_classes
    gen = head.make_anchor_generator()
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = jnp.asarray(gen.flat_anchors(shapes))          # (A, 4)
    a = anchors.shape[0]
    b = cls_scores[0].shape[0]
    flat_cls = cls_scores[0].reshape(b, -1, nc)
    flat_reg = bbox_preds[0].reshape(b, -1, 4)
    decoded = delta2bbox(anchors[None], flat_reg, head.target_means,
                         head.target_stds)

    gt = batch["gt_bboxes"]
    gtl = jnp.clip(batch["gt_labels"], 0, nc - 1)
    gtv = batch["gt_valid"]
    k = gt.shape[1]
    t = min(head.match_times, a)

    def centers(boxes):
        return jnp.stack([(boxes[..., 0] + boxes[..., 2]) / 2,
                          (boxes[..., 1] + boxes[..., 3]) / 2], axis=-1)

    ac = centers(anchors)                                    # (A, 2)
    pc = centers(jax.lax.stop_gradient(decoded))             # (B, A, 2)
    gc = centers(gt)                                         # (B, K, 2)
    # L1 center distances (B, K, A)
    d_anchor = jnp.abs(ac[None, None] - gc[:, :, None, :]).sum(-1)
    d_pred = jnp.abs(pc[:, None] - gc[:, :, None, :]).sum(-1)
    _, idx_a = jax.lax.top_k(-d_anchor, t)                   # (B, K, t)
    _, idx_p = jax.lax.top_k(-d_pred, t)
    cand = jnp.concatenate([idx_a, idx_p], axis=-1)          # (B, K, 2t)

    iou_pred = jax.vmap(bbox_overlaps)(
        jax.lax.stop_gradient(decoded), gt)                  # (B, A, K)
    # positive mask per (gt, candidate): drop low-quality (pred IoU < thr)
    cand_iou = jnp.take_along_axis(
        jnp.swapaxes(iou_pred, 1, 2), cand, axis=-1)         # (B, K, 2t)
    cand_ok = (cand_iou >= head.pos_ignore_thr) & gtv[..., None]

    # scatter to per-anchor assignment (later gts may override; ref builds
    # index lists — collisions are rare and benign)
    assigned = jnp.full((b, a), -1, jnp.int32)
    ignored_pos = jnp.zeros((b, a), bool)
    bidx = jnp.arange(b)[:, None, None].repeat(k, 1).repeat(2 * t, 2)
    gidx = jnp.arange(k)[None, :, None].repeat(b, 0).repeat(2 * t, 2)
    assigned = assigned.at[bidx, cand].set(
        jnp.where(cand_ok, gidx, -1))
    ignored_pos = ignored_pos.at[bidx, cand].set(~cand_ok)

    pos = assigned >= 0
    # negatives with high pred IoU to any gt are ignored
    max_iou = jnp.max(jnp.where(gtv[:, None, :], iou_pred, 0.0), axis=-1)
    neg_ignore = (max_iou > head.neg_ignore_thr) & ~pos
    weight = jnp.where(pos | ~(neg_ignore | (ignored_pos & ~pos)), 1.0, 0.0)

    labels = jnp.where(
        pos, jnp.take_along_axis(gtl, jnp.maximum(assigned, 0), axis=1), nc)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    num_pos = jnp.maximum(_psum(pos.sum().astype(jnp.float32)), 1.0)
    loss_cls = L.sigmoid_focal_loss(flat_cls, labels, weight=weight,
                                    avg_factor=num_pos)
    tgt = jnp.take_along_axis(gt, jnp.maximum(assigned, 0)[..., None],
                              axis=1)
    loss_bbox = L.giou_loss(decoded, tgt, weight=pos.astype(jnp.float32),
                            avg_factor=num_pos)
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
                       head.target_means, head.target_stds)
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
