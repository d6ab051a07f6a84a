"""Deformable DETR: multi-scale deformable attention set predictor.

Parity with ``/root/reference/mmdet/models/dense_heads/deformable_detr_head.py``
+ ``mmdet/models/utils/transformer.py`` (DeformableDetrTransformer) and the
mmcv ``MultiScaleDeformableAttention`` CUDA op: each query attends to
``num_points`` bilinear-sampled locations per head per level around its
reference point, with softmax-predicted weights over (levels x points);
6-layer deformable encoder over the flattened multi-scale maps, 6-layer
decoder with per-layer auxiliary set losses (focal cls 2.0 + L1 5.0 +
GIoU 2.0, Hungarian-matched with the same cost weights).

TPU redesign: the CUDA sampling kernel becomes plain vectorized bilinear
gathers (XLA fuses them); level layout is static so the whole model is one
jitted program.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.boxes import bbox_overlaps
from dsl_tpu.core.hungarian import (bbox_l1_cost, focal_cost,
                                    hungarian_match, iou_cost)
from dsl_tpu.models.dense_heads.detr_head import (cxcywh_to_xyxy,
                                                  xyxy_to_cxcywh)
from dsl_tpu.models.utils.transformer import sine_positional_encoding


def _bilinear_nc(img, xs, ys):
    """Bilinear sample (H, W, C) at float pixel coords (N,) -> (N, C)."""
    h, w, _ = img.shape
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(xs - x0, 0, 1)[:, None]
    wy = jnp.clip(ys - y0, 0, 1)[:, None]
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    return (img[y0i, x0i] * (1 - wy) * (1 - wx)
            + img[y0i, x1i] * (1 - wy) * wx
            + img[y1i, x0i] * wy * (1 - wx)
            + img[y1i, x1i] * wy * wx)


class MSDeformAttention(nn.Module):
    """Multi-scale deformable attention (mmcv
    ``MultiScaleDeformableAttention`` semantics, NHWC values)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4

    @nn.compact
    def __call__(self, query, value_levels, reference_points):
        """query (B, Q, C); value_levels: list of (B, Hl, Wl, C);
        reference_points (B, Q, 2) normalized [0, 1] — or (B, Q, 4)
        normalized cxcywh boxes (box-refine / two-stage mode, where
        sampling offsets are scaled by the box extent:
        ``deformable_attn`` 4-d branch) -> (B, Q, C)."""
        b, q, c = query.shape
        nh, nl, npt = self.num_heads, len(value_levels), self.num_points
        ch = c // nh
        offsets = nn.Dense(nh * nl * npt * 2,
                           kernel_init=nn.initializers.zeros,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, nh, nl, npt, 2)
        weights = nn.Dense(nh * nl * npt, name="attention_weights")(query)
        weights = jax.nn.softmax(
            weights.reshape(b, q, nh, nl * npt), axis=-1)
        weights = weights.reshape(b, q, nh, nl, npt)

        value_proj = nn.Dense(c, name="value_proj")
        out = jnp.zeros((b, q, nh, ch), query.dtype)
        for lvl, v in enumerate(value_levels):
            h, w = v.shape[1:3]
            vv = value_proj(v).reshape(b, h, w, nh, ch)
            if reference_points.shape[-1] == 4:
                # offsets in units of half the reference box extent
                locx = (reference_points[:, :, None, None, 0]
                        + offsets[:, :, :, lvl, :, 0] / npt
                        * reference_points[:, :, None, None, 2] * 0.5) \
                    * w - 0.5
                locy = (reference_points[:, :, None, None, 1]
                        + offsets[:, :, :, lvl, :, 1] / npt
                        * reference_points[:, :, None, None, 3] * 0.5) \
                    * h - 0.5
            else:
                # sampling locations in pixels; offsets are in "point"
                # units normalized by the level size (mmcv convention)
                locx = (reference_points[:, :, None, None, 0]
                        + offsets[:, :, :, lvl, :, 0] / w) * w - 0.5
                locy = (reference_points[:, :, None, None, 1]
                        + offsets[:, :, :, lvl, :, 1] / h) * h - 0.5

            def per_image(vimg, lx, ly):
                # vimg (h, w, nh, ch) -> per head sample
                def per_head(vh, lxh, lyh):      # (h, w, ch), (Q, P)
                    s = _bilinear_nc(vh, lxh.reshape(-1), lyh.reshape(-1))
                    return s.reshape(q, npt, ch)

                return jax.vmap(per_head, in_axes=(2, 1, 1), out_axes=1)(
                    vimg, lx, ly)                 # (Q, nh, P, ch)

            sampled = jax.vmap(per_image)(vv, locx, locy)  # (B,Q,nh,P,ch)
            out = out + (sampled
                         * weights[:, :, :, lvl, :, None]).sum(axis=3)
        out = out.reshape(b, q, c)
        return nn.Dense(c, name="output_proj")(out)


def _proposal_pos_embed(coords: jnp.ndarray, num_feats: int = 64,
                        temperature: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding of normalized cxcywh proposals
    (``get_proposal_pos_embed``): (B, Q, 4) -> (B, Q, 4*num_feats)."""
    import math

    dim_t = temperature ** (
        2 * (jnp.arange(num_feats) // 2) / num_feats)
    pos = coords[..., None] * (2 * math.pi) / dim_t     # (B, Q, 4, F)
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1)
    return pos.reshape(coords.shape[:-1] + (4 * num_feats,))


class _FFN(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Dense(self.hidden, name="fc0")(x))
        return nn.Dense(self.dim, name="fc1")(y)


@HEADS.register
class DeformableDETRHead(nn.Module):
    num_classes: int = 80
    embed_dims: int = 256
    num_query: int = 300
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 1024
    in_channels: int = 256     # config parity
    with_box_refine: bool = False  # iterative refinement (deformable_detr.py)
    as_two_stage: bool = False     # encoder proposals become the queries
    cost_cls: float = 2.0
    cost_bbox: float = 5.0
    cost_iou: float = 2.0
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0

    @nn.compact
    def __call__(self, feats, training: bool = False):
        """feats: multi-level NHWC tuple (ChannelMapper outputs). Returns
        (cls (B, L, Q, C), boxes (B, L, Q, 4) normalized cxcywh)."""
        feats = list(feats)[:self.num_levels]
        b = feats[0].shape[0]
        c = self.embed_dims
        shapes = [f.shape[1:3] for f in feats]

        # per-level positional encodings + level embedding
        lvl_embed = self.param("level_embed", nn.initializers.normal(1.0),
                               (len(feats), c))
        flat, pos_flat, centers = [], [], []
        for i, f in enumerate(feats):
            h, w = shapes[i]
            pos = sine_positional_encoding(jnp.ones((b, h, w)), c // 2)
            flat.append(f.reshape(b, h * w, c))
            pos_flat.append(pos.reshape(b, h * w, c) + lvl_embed[i])
            ys = (jnp.arange(h) + 0.5) / h
            xs = (jnp.arange(w) + 0.5) / w
            cx, cy = jnp.meshgrid(xs, ys)
            centers.append(jnp.stack([cx.ravel(), cy.ravel()], -1))
        x = jnp.concatenate(flat, axis=1)                  # (B, S, C)
        pos_all = jnp.concatenate(pos_flat, axis=1)
        centers = jnp.broadcast_to(
            jnp.concatenate(centers, axis=0)[None],
            (b, x.shape[1], 2))

        def split_levels(t):
            outs, start = [], 0
            for (h, w) in shapes:
                outs.append(t[:, start:start + h * w].reshape(b, h, w, c))
                start += h * w
            return outs

        # --- encoder ---
        for i in range(self.num_encoder_layers):
            attn = MSDeformAttention(embed_dims=c, num_heads=self.num_heads,
                                     num_levels=len(feats),
                                     num_points=self.num_points,
                                     name=f"enc_attn{i}")
            x = nn.LayerNorm(name=f"enc_ln1_{i}")(
                x + attn(x + pos_all, split_levels(x), centers))
            x = nn.LayerNorm(name=f"enc_ln2_{i}")(
                x + _FFN(c, self.ffn_dim, name=f"enc_ffn{i}")(x))
        memory_levels = split_levels(x)

        # --- decoder queries ---
        enc_cls = enc_box = None
        if self.as_two_stage:
            # encoder proposals (``gen_encoder_output_proposals`` +
            # ``pos_trans_fc``): per-position base proposal at the grid
            # center with a level-scaled extent, refined by a reg branch on
            # the memory; top-num_query by class score become the 4-d refs.
            scales = []
            for lvl, (h, w) in enumerate(shapes):
                scales.append(jnp.full((h * w, 2), 0.05 * (2.0 ** lvl)))
            base = jnp.concatenate(
                [centers, jnp.broadcast_to(
                    jnp.concatenate(scales, 0)[None], centers.shape)], -1)
            base_logit = jnp.log(jnp.clip(base, 1e-6)
                                 / jnp.clip(1 - base, 1e-6))
            mem = nn.LayerNorm(name="enc_out_norm")(
                nn.Dense(c, name="enc_out_fc")(x))
            enc_cls = nn.Dense(self.num_classes,
                               bias_init=nn.initializers.constant(-4.595),
                               name="enc_cls_branch")(mem)
            reg = mem
            for j in range(2):
                reg = nn.relu(nn.Dense(c, name=f"enc_reg_fc{j}")(reg))
            enc_box = jax.nn.sigmoid(
                nn.Dense(4, name="enc_reg_out")(reg) + base_logit)
            # reference transformer.py:648-650 ranks proposals by the
            # CLASS-0 logit alone (enc_outputs_class[..., 0]), not the max.
            score = enc_cls[..., 0]                        # (B, S)
            # Tiny test inputs can have fewer encoder positions than
            # num_query (real 800x1344 inputs always have thousands);
            # clamp k and repeat proposals modularly to keep Q static.
            k = min(self.num_query, score.shape[-1])
            _, top = jax.lax.top_k(score, k)
            if k < self.num_query:
                top = jnp.tile(top, (1, -(-self.num_query // k))
                               )[:, :self.num_query]
            ref = jax.lax.stop_gradient(jnp.take_along_axis(
                enc_box, top[..., None], axis=1))          # (B, Q, 4)
            pe = _proposal_pos_embed(ref, c // 4)
            qe2 = nn.LayerNorm(name="pos_trans_norm")(
                nn.Dense(2 * c, name="pos_trans_fc")(pe))
            query_pos, query = qe2[..., :c], qe2[..., c:]
        else:
            qe = self.param("query_embed", nn.initializers.normal(1.0),
                            (self.num_query, 2 * c))
            query_pos = jnp.broadcast_to(qe[None, :, :c],
                                         (b, self.num_query, c))
            query = jnp.broadcast_to(qe[None, :, c:], (b, self.num_query, c))
            ref = jax.nn.sigmoid(
                nn.Dense(2, name="reference_points")(query_pos))  # (B, Q, 2)

        cls_all, box_all = [], []
        for i in range(self.num_decoder_layers):
            sa = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"dec_self{i}")
            qn = query + query_pos
            query = nn.LayerNorm(name=f"dec_ln1_{i}")(query + sa(qn, qn))
            ca = MSDeformAttention(embed_dims=c, num_heads=self.num_heads,
                                   num_levels=len(feats),
                                   num_points=self.num_points,
                                   name=f"dec_cross{i}")
            query = nn.LayerNorm(name=f"dec_ln2_{i}")(
                query + ca(query + query_pos, memory_levels, ref))
            query = nn.LayerNorm(name=f"dec_ln3_{i}")(
                query + _FFN(c, self.ffn_dim, name=f"dec_ffn{i}")(query))

            cls_all.append(nn.Dense(
                self.num_classes,
                bias_init=nn.initializers.constant(-4.595),
                name=f"cls_branch{i}")(query))
            reg = query
            for j in range(2):
                reg = nn.relu(nn.Dense(c, name=f"reg_fc{i}_{j}")(reg))
            delta = nn.Dense(4, name=f"reg_out{i}")(reg)
            ref_logit = jnp.log(jnp.clip(ref, 1e-6)
                                / jnp.clip(1 - ref, 1e-6))
            if ref.shape[-1] == 2:
                ref_logit = jnp.concatenate(
                    [ref_logit, jnp.zeros_like(ref_logit)], axis=-1)
            box = jax.nn.sigmoid(delta + ref_logit)
            box_all.append(box)
            if self.with_box_refine:
                # next layer samples around this layer's detached box
                # (``deformable_detr.py``: reference_points = new.detach())
                ref = jax.lax.stop_gradient(box)
        cls_out = jnp.stack(cls_all, axis=1)                # (B, L, Q, C)
        box_out = jnp.stack(box_all, axis=1)                # (B, L, Q, 4)
        if self.as_two_stage:
            # encoder proposal predictions join the per-layer loss stack
            # (``deformable_detr_head.py loss``: enc outputs get the same
            # Hungarian set loss). Gathered to Q entries for static shape.
            enc_cls_q = jnp.take_along_axis(
                enc_cls, top[..., None], axis=1)
            enc_box_q = jnp.take_along_axis(
                enc_box, top[..., None], axis=1)
            cls_out = jnp.concatenate([enc_cls_q[:, None], cls_out], axis=1)
            box_out = jnp.concatenate([enc_box_q[:, None], box_out], axis=1)
        return cls_out, box_out


def deformable_detr_loss(head, outputs, batch, axis_name=None):
    """Per-decoder-layer Hungarian set losses (focal + L1 + GIoU)."""
    cls_all, box_all = outputs
    b, nlay, q, _ = cls_all.shape
    nc = head.num_classes
    # per-image img_shape normalization (detr_head.py:506-512)
    if batch.get("img_shapes") is not None:
        hw = batch["img_shapes"]
        factor = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]],
                           axis=-1)[:, None, :]            # (B, 1, 4)
    else:
        img_h, img_w = batch["images"].shape[1:3]
        factor = jnp.broadcast_to(
            jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32),
            (b, 1, 4))

    gt_xyxy = batch["gt_bboxes"]
    gt_norm = xyxy_to_cxcywh(gt_xyxy / factor)
    gtl = jnp.clip(batch["gt_labels"], 0, nc - 1)
    gtv = batch["gt_valid"]
    num_gt = jnp.maximum(gtv.astype(jnp.float32).sum(), 1.0)
    if axis_name:
        num_gt = jax.lax.pmean(num_gt, axis_name)

    losses = {}
    for layer in range(nlay):
        cls = cls_all[:, layer]
        box = box_all[:, layer]

        def per_image_cost(c_, bx, gl, gn, gx, f):
            # L1 matching cost in normalized XYXY (box_format='xyxy'),
            # unlike the cxcywh loss target — see detr_head.py note
            return (focal_cost(c_, gl, head.cost_cls)
                    + bbox_l1_cost(cxcywh_to_xyxy(bx), gx / f,
                                   head.cost_bbox)
                    + iou_cost(cxcywh_to_xyxy(bx) * f, gx,
                               head.cost_iou))

        cost = jax.lax.stop_gradient(jax.vmap(per_image_cost)(
            cls, box, gtl, gt_norm, gt_xyxy, factor))
        cost = jnp.where(gtv[:, None, :], cost, 1e8)
        assigned = hungarian_match(cost, gtv)
        pos = assigned >= 0
        safe = jnp.maximum(assigned, 0)
        labels = jnp.where(pos, jnp.take_along_axis(gtl, safe, axis=1), nc)
        tgt_norm = jnp.take_along_axis(gt_norm, safe[..., None], axis=1)
        tgt_xyxy = jnp.take_along_axis(gt_xyxy, safe[..., None], axis=1)

        posf = pos.astype(jnp.float32)
        loss_cls = head.loss_cls_weight * L.sigmoid_focal_loss(
            cls, labels, avg_factor=num_gt)
        # reference avg_factor = num_total_pos over all 4 coords
        loss_bbox = head.loss_bbox_weight * L.l1_loss(
            box, tgt_norm, weight=posf[..., None], avg_factor=num_gt)
        giou = bbox_overlaps(cxcywh_to_xyxy(box) * factor, tgt_xyxy,
                             mode="giou", is_aligned=True)
        loss_iou = head.loss_iou_weight * jnp.sum((1 - giou) * posf) / num_gt
        sfx = "" if layer == nlay - 1 else f"_aux{layer}"
        losses[f"loss_cls{sfx}"] = loss_cls
        losses[f"loss_bbox{sfx}"] = loss_bbox
        losses[f"loss_iou{sfx}"] = loss_iou
    return losses


def deformable_detr_get_bboxes(head, outputs, img_shapes=None,
                               scale_factors=None, score_thr=0.0,
                               max_per_img=100, **unused):
    """Sigmoid scores, topk over (query, class), no NMS (reference
    ``_get_bboxes_single``)."""
    cls_all, box_all = outputs
    cls = cls_all[:, -1]
    box = box_all[:, -1]
    b, q, nc = cls.shape
    scores = jax.nn.sigmoid(cls).reshape(b, -1)
    k = min(max_per_img, q * nc)
    top, idx = jax.lax.top_k(scores, k)
    labels = idx % nc
    qidx = idx // nc
    sel = jnp.take_along_axis(box, qidx[..., None], axis=1)
    if img_shapes is None:
        factor = jnp.ones((b, 4))
    else:
        factor = jnp.stack([img_shapes[:, 1], img_shapes[:, 0],
                            img_shapes[:, 1], img_shapes[:, 0]], axis=-1)
    boxes = cxcywh_to_xyxy(sel) * factor[:, None, :]
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]
    dets = jnp.concatenate([boxes, top[..., None]], axis=-1)
    return dets, labels, top > score_thr
