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
from dsl_tpu.core.boxes import bbox2delta, delta2bbox
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

    def make_anchor_generator(self) -> AnchorGenerator:
        cfg = dict(self.anchor_generator or {})
        return AnchorGenerator(
            strides=cfg.get("strides", list(self.strides)),
            ratios=cfg.get("ratios", list(self.anchor_ratios)),
            scales=cfg.get("scales", list(self.anchor_scales)))

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


def rpn_loss(head: RPNHead, scores, deltas, batch,
             axis_name: str | None = None):
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(s.shape[1:3]) for s in scores]
    anchors = gen.flat_anchors(featmap_sizes)

    # class-agnostic: every gt has label 0
    labels, assigned, weights, _ = max_iou_assign(
        anchors, batch["gt_bboxes"],
        jnp.zeros_like(batch["gt_labels"]), batch["gt_valid"],
        pos_iou_thr=head.pos_iou_thr, neg_iou_thr=head.neg_iou_thr,
        min_pos_iou=1e-3, num_classes=1)

    b = labels.shape[0]
    flat_score = jnp.concatenate(
        [s.reshape(b, -1) for s in scores], axis=1)
    flat_delta = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in deltas], axis=1)
    pos = labels < 1
    pos_f = pos.astype(jnp.float32)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    num_valid = jnp.maximum(_psum(jnp.sum(weights)), 1.0)
    num_pos = jnp.maximum(_psum(jnp.sum(pos_f)), 1.0)
    loss_cls = L.binary_cross_entropy(flat_score, pos_f, weight=weights,
                                      avg_factor=num_valid)
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
    tgt = bbox2delta(anchors[None], gt, head.target_means, head.target_stds)
    loss_reg = L.l1_loss(flat_delta, tgt, weight=pos_f[..., None],
                         avg_factor=num_pos)
    return dict(loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_reg)


def rpn_proposals(head: RPNHead, scores, deltas, img_shapes=None,
                  nms_pre: int = 1000, nms_iou: float = 0.7,
                  num_proposals: int = 1000):
    """Fixed-shape proposal generation.

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
        boxes = delta2bbox(anchors, dl, head.target_means, head.target_stds)
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

    def _single(bx, s):
        dets, idx, valid = nms(bx, s, nms_iou, max_out=num_proposals)
        return dets[:, :4], dets[:, 4], valid

    return jax.vmap(_single)(boxes, sc)


def rpn_loss_any(head, rpn_out, batch, **kw):
    """Dispatch RPN losses by head type (RPNHead / GARPNHead /
    CascadeRPNHead)."""
    if type(head).__name__ == "GARPNHead":
        from dsl_tpu.models.dense_heads.ga_rpn_head import ga_rpn_loss

        return ga_rpn_loss(head, rpn_out, batch)
    if type(head).__name__ == "CascadeRPNHead":
        from dsl_tpu.models.dense_heads.cascade_rpn_head import \
            cascade_rpn_loss

        return cascade_rpn_loss(head, rpn_out, batch)
    scores, deltas = rpn_out
    return rpn_loss(head, scores, deltas, batch, **kw)


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
