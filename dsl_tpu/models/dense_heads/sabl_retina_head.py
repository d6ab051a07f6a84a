"""SABL RetinaNet head (Side-Aware Boundary Localization).

Parity with ``/root/reference/mmdet/models/dense_heads/sabl_retina_head.py:
16-622``: one square anchor per location (scale 4), ApproxMaxIoU assignment
against the 9-approx anchor set, focal cls loss, per-side bucket-cls BCE
(x1.5, avg num_pos*4*side_num) + bucket-offset SmoothL1 (beta 1/9, x1.5,
avg num_pos*4*offset_topk), bucketing decode with guided rescoring at test
(``core/bucket_coder.py``).

TPU shape: dense masked target arrays over all squares, no sampling lists.
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
from dsl_tpu.core.assigners import approx_max_iou_assign
from dsl_tpu.core.bucket_coder import bbox2bucket, bucket2bbox
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import bias_init_with_prob, normal_init


@HEADS.register
class SABLRetinaHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    num_buckets: int = 14
    scale_factor: float = 3.0
    offset_topk: int = 2
    offset_upperbound: float = 1.0
    cls_ignore_neighbor: bool = True
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    # config-parity fields
    approx_anchor_generator: dict | None = None
    square_anchor_generator: dict | None = None
    bbox_coder: dict | None = None
    loss_cls: dict | None = None
    loss_bbox_cls: dict | None = None
    loss_bbox_reg: dict | None = None
    norm_cfg: dict | None = None   # GN towers (sabl *gn* configs)

    @property
    def resolved_num_buckets(self) -> int:
        return int((self.bbox_coder or {}).get("num_buckets",
                                               self.num_buckets))

    @property
    def resolved_scale_factor(self) -> float:
        return float((self.bbox_coder or {}).get("scale_factor",
                                                 self.scale_factor))

    @property
    def side_num(self) -> int:
        return int(math.ceil(self.resolved_num_buckets / 2.0))

    def make_square_generator(self) -> AnchorGenerator:
        cfg = dict(self.square_anchor_generator or {})
        return AnchorGenerator(
            strides=cfg.get("strides", list(self.strides)),
            ratios=cfg.get("ratios", [1.0]),
            octave_base_scale=cfg.get("scales", [4])[0],
            scales_per_octave=1)

    def make_approx_generator(self) -> AnchorGenerator:
        cfg = dict(self.approx_anchor_generator or {})
        return AnchorGenerator(
            strides=cfg.get("strides", list(self.strides)),
            ratios=cfg.get("ratios", [0.5, 1.0, 2.0]),
            octave_base_scale=cfg.get("octave_base_scale", 4),
            scales_per_octave=cfg.get("scales_per_octave", 3))

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
        retina_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                             kernel_init=normal_init(0.01),
                             bias_init=bias_init_with_prob(0.01),
                             name="retina_cls")
        retina_bbox_cls = nn.Conv(self.side_num * 4, (3, 3), padding=1,
                                  kernel_init=normal_init(0.01),
                                  name="retina_bbox_cls")
        retina_bbox_reg = nn.Conv(self.side_num * 4, (3, 3), padding=1,
                                  kernel_init=normal_init(0.01),
                                  name="retina_bbox_reg")
        from dsl_tpu.models.layers import make_norm
        cls_norms = [make_norm(self.norm_cfg, name=f"cls_gn{i}")
                     if self.norm_cfg else None
                     for i in range(self.stacked_convs)]
        reg_norms = [make_norm(self.norm_cfg, name=f"reg_gn{i}")
                     if self.norm_cfg else None
                     for i in range(self.stacked_convs)]
        cls_scores, bucket_cls, bucket_reg = [], [], []
        for x in feats:
            cf, rf = x, x
            for conv, norm in zip(cls_convs, cls_norms):
                cf = conv(cf)
                if norm is not None:
                    cf = norm(cf)
                cf = nn.relu(cf)
            for conv, norm in zip(reg_convs, reg_norms):
                rf = conv(rf)
                if norm is not None:
                    rf = norm(rf)
                rf = nn.relu(rf)
            cls_scores.append(retina_cls(cf))
            bucket_cls.append(retina_bbox_cls(rf))
            bucket_reg.append(retina_bbox_reg(rf))
        return tuple(cls_scores), tuple(bucket_cls), tuple(bucket_reg)


def _grouped_approxs(head, featmap_sizes):
    """(A, G, 4) approx anchors grouped per square location (anchor index
    is fastest in the flat layout)."""
    gen = head.make_approx_generator()
    g = gen.num_base_anchors
    lvls = [lvl.reshape(-1, g, 4) for lvl in gen.grid_anchors(featmap_sizes)]
    return jnp.concatenate(lvls, axis=0)


def sabl_loss(head: SABLRetinaHead, cls_scores, bucket_cls, bucket_reg,
              batch, axis_name: str | None = None):
    nc = head.num_classes
    sn = head.side_num
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    squares = head.make_square_generator().flat_anchors(featmap_sizes)
    approxs = _grouped_approxs(head, featmap_sizes)

    labels, assigned, weights, _ = approx_max_iou_assign(
        approxs, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
        pos_iou_thr=head.pos_iou_thr, neg_iou_thr=head.neg_iou_thr,
        min_pos_iou=head.min_pos_iou, num_classes=nc)

    b = labels.shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    flat_bcls = jnp.concatenate(
        [c.reshape(b, -1, sn * 4) for c in bucket_cls], axis=1)
    flat_breg = jnp.concatenate(
        [c.reshape(b, -1, sn * 4) for c in bucket_reg], axis=1)

    pos = labels < nc
    pos_f = pos.astype(jnp.float32)
    num_pos = jnp.sum(pos_f)
    if axis_name:
        num_pos = jax.lax.psum(num_pos, axis_name)
    num_pos = jnp.maximum(num_pos, 1.0)

    # honor the loss config dicts (reference sabl config :28-37: FocalLoss
    # w1, sigmoid-CE w1.5, SmoothL1 beta 1/9 w1.5) or fail loudly
    cls_cfg = dict(head.loss_cls or {})
    if cls_cfg.get("type", "FocalLoss") != "FocalLoss":
        raise NotImplementedError(
            f"SABL loss_cls {cls_cfg.get('type')!r} unsupported")
    bcls_cfg = dict(head.loss_bbox_cls or {})
    if bcls_cfg.get("type", "CrossEntropyLoss") != "CrossEntropyLoss":
        raise NotImplementedError(
            f"SABL loss_bbox_cls {bcls_cfg.get('type')!r} unsupported")
    breg_cfg = dict(head.loss_bbox_reg or {})
    if breg_cfg.get("type", "SmoothL1Loss") != "SmoothL1Loss":
        raise NotImplementedError(
            f"SABL loss_bbox_reg {breg_cfg.get('type')!r} unsupported")

    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * L.sigmoid_focal_loss(
        flat_cls, labels, weight=weights, avg_factor=num_pos)

    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)

    def encode(sq, g):
        return bbox2bucket(sq, g, head.resolved_num_buckets,
                           head.resolved_scale_factor,
                           head.offset_topk, head.offset_upperbound,
                           head.cls_ignore_neighbor)

    offsets, off_w, blabels, bcls_w = jax.vmap(
        lambda g: encode(squares, g))(gt)
    off_w = off_w * pos_f[..., None]
    bcls_w = bcls_w * pos_f[..., None]

    loss_bbox_cls = float(bcls_cfg.get("loss_weight", 1.5)) * \
        L.binary_cross_entropy(
            flat_bcls, blabels, weight=bcls_w, reduction="mean",
            avg_factor=num_pos * 4 * sn)
    loss_bbox_reg = float(breg_cfg.get("loss_weight", 1.5)) * \
        L.smooth_l1_loss(
            flat_breg, offsets, beta=float(breg_cfg.get("beta", 1.0 / 9.0)),
            weight=off_w, reduction="mean",
            avg_factor=num_pos * 4 * head.offset_topk)
    return dict(loss_cls=loss_cls, loss_bbox_cls=loss_bbox_cls,
                loss_bbox_reg=loss_bbox_reg)


def sabl_get_bboxes(head: SABLRetinaHead, cls_scores, bucket_cls, bucket_reg,
                    img_shapes=None, scale_factors=None, nms_pre=1000,
                    score_thr=0.05, iou_threshold=0.5, max_per_img=100):
    nc = head.num_classes
    sn = head.side_num
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    lvl_squares = head.make_square_generator().grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]

    boxes_all, scores_all, conf_all = [], [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.sigmoid(cls_scores[lvl].reshape(b, -1, nc))
        bcls = bucket_cls[lvl].reshape(b, -1, sn * 4)
        breg = bucket_reg[lvl].reshape(b, -1, sn * 4)
        squares = lvl_squares[lvl][None].repeat(b, axis=0)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, top = jax.lax.top_k(rank, k)
        take = lambda a: jnp.take_along_axis(
            a, top.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
        scores, bcls, breg, squares = (take(scores), take(bcls), take(breg),
                                       take(squares))
        boxes, conf = jax.vmap(
            lambda s, c, o: bucket2bbox(s, c, o, head.resolved_num_buckets,
                                        head.resolved_scale_factor))(squares, bcls,
                                                            breg)
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
        conf_all.append(conf)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    confs = jnp.concatenate(conf_all, axis=1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc, cf):
        # bucketing-guided rescoring via score_factors: score_thr applies
        # to the RAW scores (reference sabl_retina_head.py:621)
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img, score_factors=cf)

    return jax.vmap(_single)(boxes, scores, confs)
