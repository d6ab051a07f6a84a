"""RetinaNet head (anchor-based tier) — module + functional loss/decode.

Parity with ``/root/reference/mmdet/models/dense_heads/anchor_head.py`` +
``retina_head.py``: 4 stacked 3x3 convs per branch (no norm), per-anchor
class logits (sigmoid focal) and box deltas (L1 on encoded targets),
MaxIoU assignment (pos 0.5 / neg 0.4), delta decode + multiclass NMS at
test. Fixed-shape dense masked arithmetic throughout.
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
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import bias_init_with_prob, normal_init


@HEADS.register
class RetinaHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    # assigner config (train_cfg parity)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    loss_cls: dict | None = None
    loss_bbox: dict | None = None
    anchor_generator: dict | None = None
    bbox_coder: dict | None = None   # LegacyDeltaXYWHBBoxCoder supported

    def make_anchor_generator(self) -> AnchorGenerator:
        from dsl_tpu.core.anchors import anchor_generator_from_cfg

        return anchor_generator_from_cfg(
            self.anchor_generator,
            strides=list(self.strides), ratios=list(self.anchor_ratios),
            octave_base_scale=self.octave_base_scale,
            scales_per_octave=self.scales_per_octave)

    @nn.compact
    def __call__(self, feats, training: bool = False):
        num_anchors = len(self.anchor_ratios) * self.scales_per_octave
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=((1, 1), (1, 1)),
                             kernel_init=normal_init(0.01),
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=((1, 1), (1, 1)),
                             kernel_init=normal_init(0.01),
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(num_anchors * self.num_classes, (3, 3),
                             padding=((1, 1), (1, 1)),
                             kernel_init=normal_init(0.01),
                             bias_init=bias_init_with_prob(0.01),
                             name="retina_cls")
        retina_reg = nn.Conv(num_anchors * 4, (3, 3),
                             padding=((1, 1), (1, 1)),
                             kernel_init=normal_init(0.01),
                             name="retina_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            cls_scores.append(retina_cls(cf))
            bbox_preds.append(retina_reg(rf))
        return tuple(cls_scores), tuple(bbox_preds)


@HEADS.register
class RetinaSepBNHead(RetinaHead):
    """Retina head for NAS-FPN (``retina_sepbn_head.py``): the 3x3 conv
    *kernels* are shared across pyramid levels while each level keeps its
    own BatchNorm (``_init_layers`` :36-69 ties ``convs[j][i].conv`` to
    ``convs[0][i].conv``). Here the shared convs are instantiated once and
    per-(level, stack) FrozenBatchNorms carry the level-specific stats."""

    num_ins: int = 5

    @nn.compact
    def __call__(self, feats, training: bool = False):
        from dsl_tpu.models.layers import make_norm

        num_anchors = len(self.anchor_ratios) * self.scales_per_octave
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=((1, 1), (1, 1)), use_bias=False,
                             kernel_init=normal_init(0.01),
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=((1, 1), (1, 1)), use_bias=False,
                             kernel_init=normal_init(0.01),
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(num_anchors * self.num_classes, (3, 3),
                             padding=((1, 1), (1, 1)),
                             kernel_init=normal_init(0.01),
                             bias_init=bias_init_with_prob(0.01),
                             name="retina_cls")
        retina_reg = nn.Conv(num_anchors * 4, (3, 3),
                             padding=((1, 1), (1, 1)),
                             kernel_init=normal_init(0.01),
                             name="retina_reg")
        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for i in range(self.stacked_convs):
                cf = nn.relu(make_norm(
                    dict(type="BN"),
                    name=f"cls_bn_l{lvl}_s{i}")(cls_convs[i](cf)))
                rf = nn.relu(make_norm(
                    dict(type="BN"),
                    name=f"reg_bn_l{lvl}_s{i}")(reg_convs[i](rf)))
            cls_scores.append(retina_cls(cf))
            bbox_preds.append(retina_reg(rf))
        return tuple(cls_scores), tuple(bbox_preds)


def retina_loss(head: RetinaHead, cls_scores, bbox_preds, batch,
                axis_name: str | None = None):
    """Focal + L1 loss over MaxIoU-assigned anchors."""
    nc = head.num_classes
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = gen.flat_anchors(featmap_sizes)            # (A, 4)

    labels, assigned, weights, _ = max_iou_assign(
        anchors, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
        pos_iou_thr=head.pos_iou_thr, neg_iou_thr=head.neg_iou_thr,
        min_pos_iou=head.min_pos_iou, num_classes=nc)    # (B, A)

    b = labels.shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)   # (B, A, C)
    flat_reg = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1)    # (B, A, 4)

    pos = labels < nc
    num_pos = jnp.sum(pos.astype(jnp.float32))
    if axis_name:
        num_pos = jax.lax.psum(num_pos, axis_name)
    num_pos = jnp.maximum(num_pos, 1.0)

    aux: dict = {}
    cls_cfg = dict(head.loss_cls or {})
    cls_type = cls_cfg.get("type", "FocalLoss")
    if cls_type == "GHMC":
        # GHM-C over the per-anchor one-hot targets (``configs/ghm``)
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, nc - 1), nc) \
            * (labels < nc)[..., None]
        lw = jnp.broadcast_to(weights[..., None], flat_cls.shape)
        bins = int(cls_cfg.get("bins", 10))
        mom = float(cls_cfg.get("momentum", 0.0))
        if mom > 0:
            # EMA bin counts are explicit traced state: in through
            # ``batch['ghm_acc_sum']``, out through the (non-loss)
            # ``state_ghm_acc_sum`` log var — the training loop feeds it
            # back (apis/train.py step_with_placement)
            acc = batch.get("ghm_acc_sum")
            if acc is None:
                acc = jnp.zeros((bins,), jnp.float32)
            loss_cls, new_acc = L.ghm_c_loss(
                flat_cls, onehot, lw, bins=bins, momentum=mom, acc_sum=acc)
            aux["state_ghm_acc_sum"] = new_acc
        else:
            loss_cls = L.ghm_c_loss(flat_cls, onehot, lw, bins=bins)
        loss_cls = loss_cls * float(cls_cfg.get("loss_weight", 1.0))
    else:
        loss_cls = L.sigmoid_focal_loss(flat_cls, labels, weight=weights,
                                        avg_factor=num_pos)

    # bbox targets: encode assigned gt vs anchor
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
    enc, _, cd_means, cd_stds = resolve_delta_coder(
        head.bbox_coder, head.target_means, head.target_stds)
    deltas = enc(anchors[None], gt, cd_means, cd_stds)
    posw = pos.astype(jnp.float32)[..., None]
    bbox_cfg = dict(head.loss_bbox or {})
    bbox_type = bbox_cfg.get("type", "L1Loss")
    if bbox_type == "GHMR":
        rbins = int(bbox_cfg.get("bins", 10))
        rmom = float(bbox_cfg.get("momentum", 0.0))
        rlw = jnp.broadcast_to(posw, flat_reg.shape)
        if rmom > 0:
            racc = batch.get("ghm_r_acc_sum")
            if racc is None:
                racc = jnp.zeros((rbins,), jnp.float32)
            loss_bbox, new_racc = L.ghm_r_loss(
                flat_reg, deltas, rlw, mu=float(bbox_cfg.get("mu", 0.02)),
                bins=rbins, momentum=rmom, acc_sum=racc)
            aux["state_ghm_r_acc_sum"] = new_racc
        else:
            loss_bbox = L.ghm_r_loss(
                flat_reg, deltas, rlw,
                mu=float(bbox_cfg.get("mu", 0.02)), bins=rbins)
        loss_bbox = loss_bbox * float(bbox_cfg.get("loss_weight", 1.0))
    elif bbox_type == "BalancedL1Loss":
        loss_bbox = L.balanced_l1_loss(
            flat_reg, deltas, weight=posw, avg_factor=num_pos,
            alpha=float(bbox_cfg.get("alpha", 0.5)),
            gamma=float(bbox_cfg.get("gamma", 1.5)),
            beta=float(bbox_cfg.get("beta", 1.0)))
    elif bbox_type == "SmoothL1Loss":
        loss_bbox = L.smooth_l1_loss(
            flat_reg, deltas, beta=float(bbox_cfg.get("beta", 1.0)),
            weight=posw, avg_factor=num_pos)
    else:
        loss_bbox = L.l1_loss(flat_reg, deltas, weight=posw,
                              avg_factor=num_pos)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, **aux)


def retina_get_bboxes(head: RetinaHead, cls_scores, bbox_preds,
                      img_shapes=None, scale_factors=None, nms_pre=1000,
                      score_thr=0.05, iou_threshold=0.5, max_per_img=100):
    nc = head.num_classes
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    lvl_anchors = gen.grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]

    boxes_all, scores_all = [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.sigmoid(cls_scores[lvl].reshape(b, -1, nc))
        reg = bbox_preds[lvl].reshape(b, -1, 4)
        anchors = lvl_anchors[lvl][None].repeat(b, axis=0)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, top = jax.lax.top_k(rank, k)
        take = lambda a: jnp.take_along_axis(
            a, top.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
        scores, reg, anchors = take(scores), take(reg), take(anchors)
        _, dec, cd_means, cd_stds = resolve_delta_coder(
            head.bbox_coder, head.target_means, head.target_stds)
        boxes = dec(anchors, reg, cd_means, cd_stds)
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
