"""DETR head: set prediction with Hungarian matching.

Parity with ``/root/reference/mmdet/models/dense_heads/detr_head.py``: 1x1
input projection, 100 learnable queries, sine positional encoding, the
encoder-decoder transformer, a class FC (C+1 softmax, background weight 0.1)
and a 3-layer box MLP predicting normalized (cx, cy, w, h) through sigmoid;
training matches predictions to GT per image with the Hungarian assigner
over cls + L1 + GIoU costs (weights 1/5/2), with auxiliary losses from every
decoder layer.

TPU notes: the exact scipy matcher runs through ``jax.pure_callback`` (the
reference also solves it on host); everything else is dense masked math on
K-padded GT.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.boxes import bbox_overlaps
from dsl_tpu.core.hungarian import (bbox_l1_cost, classification_cost,
                                    hungarian_match, iou_cost)
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.utils.transformer import (DetrTransformer,
                                              sine_positional_encoding)


def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


@HEADS.register
class DETRHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 2048
    embed_dims: int = 256
    num_query: int = 100
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 2048
    bg_cls_weight: float = 0.1
    cost_cls: float = 1.0
    cost_bbox: float = 5.0
    cost_iou: float = 2.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0

    @nn.compact
    def __call__(self, feats, training: bool = False):
        """feats: backbone tuple (uses the last). Returns
        (cls_logits (B, L, Q, C+1), bbox_norm (B, L, Q, 4) cxcywh in
        [0, 1])."""
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        b, h, w, _ = x.shape
        x = nn.Conv(self.embed_dims, (1, 1), name="input_proj")(x)
        mask = jnp.ones((b, h, w))
        pos = sine_positional_encoding(mask, self.embed_dims // 2)
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (self.num_query, self.embed_dims))
        hs = DetrTransformer(
            embed_dim=self.embed_dims, num_heads=self.num_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            ffn_dim=self.ffn_dim, name="transformer")(
            x.reshape(b, h * w, self.embed_dims),
            pos.reshape(b, h * w, self.embed_dims), query_embed)
        # shared prediction heads over all decoder layers
        cls_out = nn.Dense(self.num_classes + 1, name="fc_cls")(hs)
        reg = hs
        for i in range(2):
            reg = nn.relu(nn.Dense(self.embed_dims, name=f"reg_fc{i}")(reg))
        bbox_out = jax.nn.sigmoid(nn.Dense(4, name="fc_reg")(reg))
        return cls_out, bbox_out


def detr_loss(head: DETRHead, outputs, batch, axis_name=None):
    """Hungarian-matched CE + L1 + GIoU, summed over decoder layers
    (reference ``loss`` + ``loss_single`` + aux)."""
    cls_all, bbox_all = outputs            # (B, L, Q, C+1), (B, L, Q, 4)
    b, nl, q, _ = cls_all.shape
    nc = head.num_classes
    # reference normalizes by the per-image img_shape (detr_head.py:506-512)
    if batch.get("img_shapes") is not None:
        hw = batch["img_shapes"]
        factor = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]],
                           axis=-1)[:, None, :]            # (B, 1, 4)
    else:
        img_h = batch["images"].shape[1]
        img_w = batch["images"].shape[2]
        factor = jnp.broadcast_to(
            jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32),
            (b, 1, 4))

    gt_xyxy = batch["gt_bboxes"]
    gt_norm = xyxy_to_cxcywh(gt_xyxy / factor)             # (B, K, 4)
    gtl = jnp.clip(batch["gt_labels"], 0, nc - 1)
    gtv = batch["gt_valid"].astype(jnp.float32)
    num_gt = gtv.sum()
    if axis_name:
        num_gt = jax.lax.pmean(num_gt, axis_name)
    num_gt = jnp.maximum(num_gt, 1.0)

    losses = {}
    for layer in range(nl):
        cls = cls_all[:, layer]                            # (B, Q, C+1)
        bbox = bbox_all[:, layer]                          # (B, Q, 4) norm

        def per_image_cost(c, bx, gl, gn, gx, f):
            # BBoxL1Cost(box_format='xyxy'): the L1 matching cost is in
            # NORMALIZED XYXY (pred converted, gt divided by the factor) —
            # unlike the loss target, which is cxcywh
            # (``match_cost.py:44-49`` + ``hungarian_assigner.py:120-122``)
            cost = classification_cost(c, gl, head.cost_cls) \
                + bbox_l1_cost(cxcywh_to_xyxy(bx), gx / f, head.cost_bbox) \
                + iou_cost(cxcywh_to_xyxy(bx) * f, gx, head.cost_iou)
            return cost

        cost = jax.lax.stop_gradient(jax.vmap(per_image_cost)(
            cls, bbox, gtl, gt_norm, gt_xyxy, factor))     # (B, Q, K)
        cost = jnp.where(gtv[:, None, :] > 0, cost, 1e8)
        assigned = hungarian_match(cost, batch["gt_valid"])  # (B, Q)
        pos = assigned >= 0
        safe = jnp.maximum(assigned, 0)
        labels = jnp.where(pos, jnp.take_along_axis(gtl, safe, axis=1), nc)
        tgt_norm = jnp.take_along_axis(gt_norm, safe[..., None], axis=1)
        tgt_xyxy = jnp.take_along_axis(gt_xyxy, safe[..., None], axis=1)

        # CE with background down-weight (reference bg_cls_weight 0.1)
        wc = jnp.where(pos, 1.0, head.bg_cls_weight)
        cls_avg = jnp.maximum(wc.sum(), 1.0)
        loss_cls = head.loss_cls_weight * L.cross_entropy(
            cls.reshape(-1, nc + 1), labels.reshape(-1),
            weight=wc.reshape(-1), avg_factor=cls_avg)
        posf = pos.astype(jnp.float32)
        # reference avg_factor = num_total_pos, summing all 4 coordinates
        # (``loss_single`` :330-332)
        loss_bbox = head.loss_bbox_weight * L.l1_loss(
            bbox, tgt_norm, weight=posf[..., None], avg_factor=num_gt)
        giou = bbox_overlaps(cxcywh_to_xyxy(bbox) * factor, tgt_xyxy,
                             mode="giou", is_aligned=True)
        loss_iou = head.loss_iou_weight * jnp.sum(
            (1.0 - giou) * posf) / num_gt

        sfx = "" if layer == nl - 1 else f"_aux{layer}"
        losses[f"loss_cls{sfx}"] = loss_cls
        losses[f"loss_bbox{sfx}"] = loss_bbox
        losses[f"loss_iou{sfx}"] = loss_iou
    return losses


def detr_get_bboxes(head: DETRHead, outputs, img_shapes=None,
                    scale_factors=None, score_thr=0.0, max_per_img=100,
                    **unused):
    """Last-layer softmax scores (background dropped), boxes denormalized;
    DETR has no NMS — top max_per_img by score."""
    cls_all, bbox_all = outputs
    cls = cls_all[:, -1]
    bbox = bbox_all[:, -1]
    b, q, _ = cls.shape
    nc = head.num_classes
    scores = jax.nn.softmax(cls, axis=-1)[..., :nc]        # (B, Q, C)
    if img_shapes is None:
        factor = jnp.ones((b, 4))
    else:
        factor = jnp.stack([img_shapes[:, 1], img_shapes[:, 0],
                            img_shapes[:, 1], img_shapes[:, 0]], axis=-1)
    boxes = cxcywh_to_xyxy(bbox) * factor[:, None, :]
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    best = jnp.max(scores, axis=-1)                        # (B, Q)
    label = jnp.argmax(scores, axis=-1)
    k = min(max_per_img, q)
    top, idx = jax.lax.top_k(best, k)
    take = lambda a: jnp.take_along_axis(
        a, idx.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
    dets = jnp.concatenate([take(boxes), top[..., None]], axis=-1)
    return dets, take(label), top > score_thr
