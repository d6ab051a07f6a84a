"""Sparse R-CNN: learnable proposals + dynamic instance interactive heads.

Parity with ``/root/reference/mmdet/models/dense_heads/embedding_rpn_head.py:
10-120`` (learnable (cx,cy,w,h) proposal embeddings initialized to the whole
image + learnable proposal features), ``roi_heads/bbox_heads/dii_head.py:
17-421`` (self-attention over proposals, DynamicConv instance interaction,
FFN, LN-separated cls/reg subnets, focal cls + L1(normalized) + GIoU losses)
, ``mmdet/models/utils/transformer.py::DynamicConv`` and
``roi_heads/sparse_roi_head.py:1-327`` (6 cascaded stages, Hungarian
one-to-one assignment per stage, boxes detached between stages, no NMS).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import DETECTORS, HEADS, MODELS, build_from_cfg
from dsl_tpu.core import losses as L
from dsl_tpu.core.boxes import bbox_overlaps, delta2bbox
from dsl_tpu.core.hungarian import (bbox_l1_cost, focal_cost, hungarian_match,
                                    iou_cost)
from dsl_tpu.models.detectors.single_stage import _parse_losses
from dsl_tpu.models.roi_heads.standard_roi_head import extract_roi_feats


@HEADS.register
class EmbeddingRPNHead(nn.Module):
    num_proposals: int = 100
    proposal_feature_channel: int = 256

    @nn.compact
    def __call__(self, img_shapes):
        """img_shapes (B, 2) [h, w] -> (proposals (B, P, 4) xyxy,
        proposal_feats (B, P, C))."""
        boxes = self.param(
            "init_proposal_bboxes",
            lambda key, shape: jnp.tile(
                jnp.asarray([0.5, 0.5, 1.0, 1.0]), (self.num_proposals, 1)),
            (self.num_proposals, 4))
        feats = self.param("init_proposal_features",
                           nn.initializers.normal(1.0),
                           (self.num_proposals,
                            self.proposal_feature_channel))
        cx, cy, w, h = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
        xyxy = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                         axis=-1)
        whwh = jnp.stack([img_shapes[:, 1], img_shapes[:, 0],
                          img_shapes[:, 1], img_shapes[:, 0]], axis=-1)
        proposals = xyxy[None] * whwh[:, None, :]
        b = img_shapes.shape[0]
        return proposals, jnp.broadcast_to(
            feats[None], (b, self.num_proposals,
                          self.proposal_feature_channel))


class DynamicConv(nn.Module):
    """Instance-conditioned 1x1 conv pair (``utils/transformer.py``
    DynamicConv, with_proj=True)."""

    in_channels: int = 256
    feat_channels: int = 64
    out_channels: int = 256
    roi_size: int = 7

    @nn.compact
    def __call__(self, proposal_feat, roi_feat):
        """proposal_feat (N, C); roi_feat (N, S*S, C) -> (N, C)."""
        n = proposal_feat.shape[0]
        cin, cf, cout = self.in_channels, self.feat_channels, \
            self.out_channels
        params = nn.Dense(cin * cf + cf * cout,
                          name="dynamic_layer")(proposal_feat)
        p1 = params[:, :cin * cf].reshape(n, cin, cf)
        p2 = params[:, cin * cf:].reshape(n, cf, cout)
        x = jnp.einsum("nsc,ncf->nsf", roi_feat, p1)
        x = nn.relu(nn.LayerNorm(name="norm_in")(x))
        x = jnp.einsum("nsf,nfc->nsc", x, p2)
        x = nn.relu(nn.LayerNorm(name="norm_out")(x))
        x = x.reshape(n, -1)
        x = nn.Dense(cout, name="fc_layer")(x)
        return nn.relu(nn.LayerNorm(name="fc_norm")(x))


@HEADS.register
class DIIHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    roi_size: int = 7
    num_heads: int = 8
    feedforward_channels: int = 2048
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3
    dynamic_feat_channels: int = 64
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (0.5, 0.5, 1.0, 1.0)
    # mmdet-style loss dicts (reference sparse config :60-67: FocalLoss w2,
    # L1Loss w5, GIoULoss w2) — read by ``sparse_rcnn_loss``
    loss_cls: dict | None = None
    loss_bbox: dict | None = None
    loss_iou: dict | None = None

    @nn.compact
    def __call__(self, roi_feats, proposal_feats):
        """roi_feats (B, P, S, S, C), proposal_feats (B, P, C) ->
        (cls (B, P, C), delta (B, P, 4), obj_feats (B, P, C))."""
        b, p = proposal_feats.shape[:2]
        c = self.in_channels
        x = proposal_feats
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads,
                                               name="attention")
        x = nn.LayerNorm(name="attention_norm")(x + attn(x))

        flat = x.reshape(b * p, c)
        roi = roi_feats.reshape(b * p, -1, roi_feats.shape[-1])
        iic = DynamicConv(in_channels=c,
                          feat_channels=self.dynamic_feat_channels,
                          out_channels=c, roi_size=self.roi_size,
                          name="instance_interactive_conv")(flat, roi)
        flat = nn.LayerNorm(name="iic_norm")(flat + iic)

        ffn = nn.Dense(self.feedforward_channels, name="ffn_fc0")
        ffn_out = nn.Dense(c, name="ffn_fc1")
        flat = nn.LayerNorm(name="ffn_norm")(
            flat + ffn_out(nn.relu(ffn(flat))))

        cls_feat = flat
        for i in range(self.num_cls_fcs):
            cls_feat = nn.relu(nn.LayerNorm(name=f"cls_ln{i}")(
                nn.Dense(c, use_bias=False, name=f"cls_fc{i}")(cls_feat)))
        reg_feat = flat
        for i in range(self.num_reg_fcs):
            reg_feat = nn.relu(nn.LayerNorm(name=f"reg_ln{i}")(
                nn.Dense(c, use_bias=False, name=f"reg_fc{i}")(reg_feat)))
        cls = nn.Dense(self.num_classes,
                       bias_init=nn.initializers.constant(-4.595),
                       name="fc_cls")(cls_feat)
        delta = nn.Dense(4, name="fc_reg")(reg_feat)
        return (cls.reshape(b, p, -1), delta.reshape(b, p, 4),
                flat.reshape(b, p, c))


@DETECTORS.register
class SparseRCNN(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module                 # EmbeddingRPNHead
    bbox_heads: Sequence[nn.Module]     # DIIHead per stage
    train_cfg: Any = None
    test_cfg: Any = None

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images, training: bool = False):
        return self.extract_feat(images)

    def rpn_forward(self, img_shapes):
        return self.rpn_head(img_shapes)

    def stage_forward(self, roi_feats, proposal_feats, stage: int):
        return self.bbox_heads[stage](roi_feats, proposal_feats)


def build_sparse_rcnn(cfg: dict) -> SparseRCNN:
    cfg = dict(cfg)
    cfg.pop("type", None)
    backbone = build_from_cfg(cfg.pop("backbone"), MODELS)
    neck = build_from_cfg(cfg.pop("neck"), MODELS)
    rpn = build_from_cfg(cfg.pop("rpn_head"), MODELS)
    heads = tuple(build_from_cfg(dict(c), MODELS)
                  for c in cfg.pop("bbox_heads"))
    return SparseRCNN(backbone=backbone, neck=neck, rpn_head=rpn,
                      bbox_heads=heads,
                      train_cfg=cfg.pop("train_cfg", None),
                      test_cfg=cfg.pop("test_cfg", None))


def init_sparse_rcnn_variables(detector, rng, images):
    b = images.shape[0]
    variables = detector.init(rng, images)
    params = dict(variables["params"])
    shapes = jnp.asarray([[images.shape[1], images.shape[2]]] * b,
                         jnp.float32)
    rv = detector.init(jax.random.fold_in(rng, 1), shapes,
                       method=detector.rpn_forward)
    params.update(rv["params"])
    for stage, h in enumerate(detector.bbox_heads):
        rf = jnp.zeros((1, 2, h.roi_size, h.roi_size, h.in_channels))
        pf = jnp.zeros((1, 2, h.in_channels))
        sv = detector.init(jax.random.fold_in(rng, 2 + stage), rf, pf, stage,
                           method=detector.stage_forward)
        params.update(sv["params"])
    return {**variables, "params": params}


def _stage_forward(detector, variables, feats, proposals, proposal_feats,
                   stage, strides):
    head = detector.bbox_heads[stage]
    b, p = proposals.shape[:2]
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, p))
    flat = jnp.concatenate(
        [batch_idx.reshape(-1, 1).astype(jnp.float32),
         proposals.reshape(-1, 4)], axis=1)
    rfeats = extract_roi_feats(feats, flat,
                               jnp.ones((b * p,), bool), strides,
                               head.roi_size)
    rfeats = rfeats.reshape(b, p, head.roi_size, head.roi_size, -1)
    cls, delta, obj = detector.apply(variables, rfeats, proposal_feats,
                                     stage, method=detector.stage_forward)
    boxes = delta2bbox(proposals, delta, head.target_means,
                       head.target_stds)
    return cls, boxes, obj


def sparse_rcnn_loss(detector, variables, batch, rng_key=None,
                     cost_cls=None, cost_bbox=None, cost_iou=None,
                     loss_cls_w=None, loss_bbox_w=None, loss_iou_w=None,
                     axis_name=None):
    """Per-stage Hungarian set-prediction losses (reference
    ``sparse_roi_head.py forward_train`` + DIIHead.loss).

    Weights default to the config-read values: assigner costs from
    ``train_cfg['assigner']`` (reference sparse config :81-84, 2/5/2) and
    loss weights from the first DIIHead's loss dicts (:60-67, 2/5/2)."""
    tc = dict(detector.train_cfg or {})
    assigner = dict(tc.get("assigner", {}) or {})
    h0 = detector.bbox_heads[0]

    def _w(given, cfg, key, default):
        if given is not None:
            return float(given)
        return float(dict(cfg or {}).get(key, default))

    cost_cls = _w(cost_cls, assigner.get("cls_cost"), "weight", 2.0)
    cost_bbox = _w(cost_bbox, assigner.get("reg_cost"), "weight", 5.0)
    cost_iou = _w(cost_iou, assigner.get("iou_cost"), "weight", 2.0)
    loss_cls_w = _w(loss_cls_w, getattr(h0, "loss_cls", None),
                    "loss_weight", 2.0)
    loss_bbox_w = _w(loss_bbox_w, getattr(h0, "loss_bbox", None),
                     "loss_weight", 5.0)
    loss_iou_w = _w(loss_iou_w, getattr(h0, "loss_iou", None),
                    "loss_weight", 2.0)
    feats = detector.apply(variables, batch["images"], training=True)
    b = batch["images"].shape[0]
    img_shapes = batch.get("img_shapes")
    if img_shapes is None:
        img_shapes = jnp.asarray(
            [[batch["images"].shape[1], batch["images"].shape[2]]] * b,
            jnp.float32)
    proposals, proposal_feats = detector.apply(
        variables, img_shapes, method=detector.rpn_forward)
    strides = (4, 8, 16, 32)
    whwh = jnp.stack([img_shapes[:, 1], img_shapes[:, 0],
                      img_shapes[:, 1], img_shapes[:, 0]], axis=-1)

    gt_xyxy = batch["gt_bboxes"]
    nc = detector.bbox_heads[0].num_classes
    gtl = jnp.clip(batch["gt_labels"], 0, nc - 1)
    gtv = batch["gt_valid"]
    num_gt = jnp.maximum(gtv.astype(jnp.float32).sum(), 1.0)
    if axis_name:
        num_gt = jax.lax.pmean(num_gt, axis_name)

    losses = {}
    for stage in range(len(detector.bbox_heads)):
        cls, boxes, proposal_feats = _stage_forward(
            detector, variables, feats, proposals, proposal_feats, stage,
            strides)
        stage_losses = sparse_stage_set_loss(
            cls, boxes, gtl, gt_xyxy, gtv, whwh, nc, num_gt,
            cost_cls=cost_cls, cost_bbox=cost_bbox, cost_iou=cost_iou,
            loss_cls_w=loss_cls_w, loss_bbox_w=loss_bbox_w,
            loss_iou_w=loss_iou_w)
        for k, v in stage_losses.items():
            losses[f"s{stage}.{k}"] = v
        proposals = jax.lax.stop_gradient(boxes)
    return _parse_losses(losses)


def sparse_stage_set_loss(cls, boxes, gtl, gt_xyxy, gtv, whwh, nc, num_gt,
                          cost_cls=2.0, cost_bbox=5.0, cost_iou=2.0,
                          loss_cls_w=2.0, loss_bbox_w=5.0, loss_iou_w=2.0):
    """One Sparse R-CNN stage's Hungarian set loss (torch-oracled against
    ``sparse_roi_head.py:195-225`` + ``dii_head.py:197-280``): focal cls
    over ALL proposals avg num_pos, L1 on whwh-normalized xyxy and GIoU on
    absolute boxes — both positives-only, avg num_pos."""
    def per_image_cost(c, bx, gl, gx, f):
        # BBoxL1Cost(box_format='xywh'): Sparse R-CNN matches in
        # NORMALIZED CXCYWH (``sparse_roi_head.py`` passes
        # bbox_xyxy_to_cxcywh(proposals / imgs_whwh); ``match_cost.py``
        # converts the gt the same way)
        from dsl_tpu.models.dense_heads.detr_head import xyxy_to_cxcywh

        return (focal_cost(c, gl, cost_cls)
                + bbox_l1_cost(xyxy_to_cxcywh(bx / f),
                               xyxy_to_cxcywh(gx / f), cost_bbox)
                + iou_cost(bx, gx, cost_iou))

    cost = jax.lax.stop_gradient(jax.vmap(per_image_cost)(
        cls, boxes, gtl, gt_xyxy, whwh[:, None, :]))
    cost = jnp.where(gtv[:, None, :], cost, 1e8)
    assigned = hungarian_match(cost, gtv)                  # (B, P)
    pos = assigned >= 0
    safe = jnp.maximum(assigned, 0)
    labels = jnp.where(pos, jnp.take_along_axis(gtl, safe, axis=1), nc)
    tgt = jnp.take_along_axis(gt_xyxy, safe[..., None], axis=1)

    posf = pos.astype(jnp.float32)
    loss_cls = loss_cls_w * L.sigmoid_focal_loss(
        cls, labels, avg_factor=num_gt)
    # reference avg_factor = num_pos over all 4 coords (L1Loss in
    # ``dii_head.py:268-273``)
    loss_bbox = loss_bbox_w * L.l1_loss(
        boxes / whwh[:, None, :], tgt / whwh[:, None, :],
        weight=posf[..., None], avg_factor=num_gt)
    giou = bbox_overlaps(boxes, tgt, mode="giou", is_aligned=True)
    loss_iou = loss_iou_w * jnp.sum((1.0 - giou) * posf) / num_gt
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_iou=loss_iou)


def sparse_rcnn_predict(detector, variables, images, img_shapes=None,
                        scale_factors=None, test_cfg=None,
                        max_per_img: int = 100):
    """Last stage sigmoid scores, top-k over (proposal, class) pairs, no
    NMS (reference ``sparse_roi_head.py simple_test``)."""
    tc = dict(test_cfg or detector.test_cfg or {})
    feats = detector.apply(variables, images, training=False)
    b = images.shape[0]
    if img_shapes is None:
        img_shapes = jnp.asarray(
            [[images.shape[1], images.shape[2]]] * b, jnp.float32)
    proposals, proposal_feats = detector.apply(
        variables, img_shapes, method=detector.rpn_forward)
    strides = (4, 8, 16, 32)
    for stage in range(len(detector.bbox_heads)):
        cls, boxes, proposal_feats = _stage_forward(
            detector, variables, feats, proposals, proposal_feats, stage,
            strides)
        proposals = boxes
    nc = detector.bbox_heads[-1].num_classes
    scores = jax.nn.sigmoid(cls)                         # (B, P, C)
    p = scores.shape[1]
    k = min(tc.get("max_per_img", max_per_img), p * nc)
    flat = scores.reshape(b, -1)
    top, idx = jax.lax.top_k(flat, k)
    labels = idx % nc
    box_idx = idx // nc
    out_boxes = jnp.take_along_axis(boxes, box_idx[..., None], axis=1)
    if scale_factors is not None:
        out_boxes = out_boxes / scale_factors[:, None, :]
    dets = jnp.concatenate([out_boxes, top[..., None]], axis=-1)
    return dets, labels, top > tc.get("score_thr", 0.0)
