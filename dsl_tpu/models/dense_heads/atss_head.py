"""ATSS head: anchor-based head with adaptive sample selection + centerness.

Parity with ``/root/reference/mmdet/models/dense_heads/atss_head.py``:
RetinaNet-style towers with GN, a single anchor per location
(octave_base_scale=8, 1 scale, ratio 1.0), per-level learnable Scale on the
reg branch, centerness branch; training assigns with the ATSS rule
(mean+std adaptive IoU threshold over top-k center-distance candidates,
``core/assigners.py``), box loss is GIoU on decoded boxes weighted by
centerness targets, centerness BCE — all dense masked fixed-shape.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.assigners import atss_assign
from dsl_tpu.core.boxes import delta2bbox
from dsl_tpu.core import losses as L
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import Scale, bias_init_with_prob, normal_init


@HEADS.register
class ATSSHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 8
    scales_per_octave: int = 1
    anchor_ratios: Sequence[float] = (1.0,)
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    topk: int = 9
    anchor_generator: dict | None = None
    loss_cls: dict | None = None
    loss_bbox: dict | None = None
    loss_centerness: dict | None = None

    def make_anchor_generator(self) -> AnchorGenerator:
        cfg = dict(self.anchor_generator or {})
        return AnchorGenerator(
            strides=cfg.get("strides", list(self.strides)),
            ratios=cfg.get("ratios", list(self.anchor_ratios)),
            octave_base_scale=cfg.get("octave_base_scale",
                                      self.octave_base_scale),
            scales_per_octave=cfg.get("scales_per_octave",
                                      self.scales_per_octave))

    @nn.compact
    def __call__(self, feats, training: bool = False):
        num_anchors = len(self.anchor_ratios) * self.scales_per_octave
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)
        cls_convs = [(nn.Conv(self.feat_channels, (3, 3),
                              padding=((1, 1), (1, 1)),
                              kernel_init=normal_init(0.01),
                              name=f"cls_conv{i}"), gn(f"cls_gn{i}"))
                     for i in range(self.stacked_convs)]
        reg_convs = [(nn.Conv(self.feat_channels, (3, 3),
                              padding=((1, 1), (1, 1)),
                              kernel_init=normal_init(0.01),
                              name=f"reg_conv{i}"), gn(f"reg_gn{i}"))
                     for i in range(self.stacked_convs)]
        atss_cls = nn.Conv(num_anchors * self.num_classes, (3, 3),
                           padding=((1, 1), (1, 1)),
                           kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           name="atss_cls")
        atss_reg = nn.Conv(num_anchors * 4, (3, 3), padding=((1, 1), (1, 1)),
                           kernel_init=normal_init(0.01), name="atss_reg")
        atss_centerness = nn.Conv(num_anchors, (3, 3),
                                  padding=((1, 1), (1, 1)),
                                  kernel_init=normal_init(0.01),
                                  name="atss_centerness")
        scales = [Scale(name=f"scale{i}") for i in range(len(self.strides))]

        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for conv, norm in cls_convs:
                cf = nn.relu(norm(conv(cf)))
            for conv, norm in reg_convs:
                rf = nn.relu(norm(conv(rf)))
            cls_scores.append(atss_cls(cf))
            bbox_preds.append(scales[lvl](atss_reg(rf)))
            centernesses.append(atss_centerness(rf))
        return tuple(cls_scores), tuple(bbox_preds), tuple(centernesses)


def _atss_centerness_target(anchors, gt_boxes):
    """Centerness of the anchor center w.r.t. its assigned gt box."""
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    l = ax - gt_boxes[..., 0]
    r = gt_boxes[..., 2] - ax
    t = ay - gt_boxes[..., 1]
    b = gt_boxes[..., 3] - ay
    lr = jnp.stack([l, r], -1)
    tb = jnp.stack([t, b], -1)
    val = (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-12)) * \
          (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-12))
    return jnp.sqrt(jnp.maximum(val, 0.0))


def atss_loss(head: ATSSHead, cls_scores, bbox_preds, centernesses, batch,
              axis_name: str | None = None):
    nc = head.num_classes
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = gen.flat_anchors(featmap_sizes)
    npl = gen.num_anchors(featmap_sizes)

    labels, assigned, _, _ = atss_assign(
        anchors, npl, batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], topk=head.topk, num_classes=nc)

    b = labels.shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    flat_reg = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1)
    flat_cent = jnp.concatenate(
        [c.reshape(b, -1) for c in centernesses], axis=1)

    pos = labels < nc
    pos_f = pos.astype(jnp.float32)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    # honor the loss config dicts (reference atss config: FocalLoss
    # gamma2/alpha.25 w1, GIoULoss w2.0, sigmoid-CE w1) or fail loudly
    cls_cfg = dict(head.loss_cls or {})
    if cls_cfg.get("type", "FocalLoss") != "FocalLoss":
        raise NotImplementedError(
            f"ATSS loss_cls {cls_cfg.get('type')!r} unsupported")
    bbox_cfg = dict(head.loss_bbox or {})
    if bbox_cfg.get("type", "GIoULoss") != "GIoULoss":
        raise NotImplementedError(
            f"ATSS loss_bbox {bbox_cfg.get('type')!r} unsupported")
    cent_cfg = dict(head.loss_centerness or {})
    if cent_cfg.get("type", "CrossEntropyLoss") != "CrossEntropyLoss":
        raise NotImplementedError(
            f"ATSS loss_centerness {cent_cfg.get('type')!r} unsupported")
    bbox_lw = float(bbox_cfg.get("loss_weight", 2.0))   # atss config :46

    num_pos = jnp.maximum(_psum(jnp.sum(pos_f)), 1.0)
    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * L.sigmoid_focal_loss(
        flat_cls, labels, gamma=float(cls_cfg.get("gamma", 2.0)),
        alpha=float(cls_cfg.get("alpha", 0.25)), avg_factor=num_pos)

    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
    cent_t = _atss_centerness_target(anchors[None], gt) * pos_f
    cent_denorm = jnp.maximum(_psum(jnp.sum(cent_t)), 1e-6)
    decoded = delta2bbox(anchors[None], flat_reg, head.target_means,
                         head.target_stds)
    loss_bbox = bbox_lw * L.giou_loss(decoded, gt, weight=cent_t,
                                      avg_factor=cent_denorm)
    loss_centerness = float(cent_cfg.get("loss_weight", 1.0)) * \
        L.binary_cross_entropy(flat_cent, cent_t, weight=pos_f,
                               avg_factor=num_pos)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_centerness=loss_centerness)


def atss_get_bboxes(head: ATSSHead, cls_scores, bbox_preds, centernesses,
                    img_shapes=None, scale_factors=None, nms_pre=1000,
                    score_thr=0.05, iou_threshold=0.6, max_per_img=100):
    nc = head.num_classes
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    lvl_anchors = gen.grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]

    boxes_all, scores_all, cent_all = [], [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.sigmoid(cls_scores[lvl].reshape(b, -1, nc))
        cent = jax.nn.sigmoid(centernesses[lvl].reshape(b, -1))
        reg = bbox_preds[lvl].reshape(b, -1, 4)
        anchors = lvl_anchors[lvl][None].repeat(b, axis=0)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1) * cent
        _, top = jax.lax.top_k(rank, k)
        take = lambda a: jnp.take_along_axis(
            a, top.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
        scores, reg, anchors = take(scores), take(reg), take(anchors)
        cent = jnp.take_along_axis(cent, top, axis=1)
        boxes = delta2bbox(anchors, reg, head.target_means, head.target_stds)
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
        cent_all.append(cent)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    cent = jnp.concatenate(cent_all, axis=1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc, ct):
        # mmdet: score_thr on RAW scores, centerness multiplies after
        # (multiclass_nms score_factors — atss_head.py:495)
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img, score_factors=ct)

    return jax.vmap(_single)(boxes, scores, cent)
