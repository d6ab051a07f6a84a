"""FreeAnchor: learning-to-match retina head.

Parity with ``/root/reference/mmdet/models/dense_heads/
free_anchor_retina_head.py``: per GT a bag of the top-``pre_anchor_topk``
anchors by GT-anchor IoU; positive loss = α·BCE(Mean-max(P_cls·P_loc), 1)
with P_loc = exp(−smoothL1·w); negative loss = focal on
cls_prob·(1−box_prob), where box_prob is the per-(anchor, class) max over
same-class GTs of the saturated-linear pred-IoU (bbox_thr 0.6), normalized
by num_gt·topk.

TPU redesign: bags are a (B, K, topk) gather; the sparse per-class scatter
becomes a scatter-max; everything dense masked over K-padded GT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsl_tpu.registry import HEADS
from dsl_tpu.core.boxes import bbox2delta, bbox_overlaps, delta2bbox
from dsl_tpu.models.dense_heads.retina_head import RetinaHead


@HEADS.register
class FreeAnchorRetinaHead(RetinaHead):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    fa_gamma: float = 2.0
    fa_alpha: float = 0.5
    bbox_loss_weight: float = 0.75
    bbox_beta: float = 0.11


def free_anchor_loss(head: FreeAnchorRetinaHead, cls_scores, bbox_preds,
                     batch, axis_name: str | None = None):
    nc = head.num_classes
    gen = head.make_anchor_generator()
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = jnp.asarray(gen.flat_anchors(shapes))          # (A, 4)
    a = anchors.shape[0]
    b = cls_scores[0].shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    flat_reg = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1)
    cls_prob = jax.nn.sigmoid(flat_cls)                      # (B, A, C)

    gt = batch["gt_bboxes"]
    gtl = jnp.clip(batch["gt_labels"], 0, nc - 1)
    gtv = batch["gt_valid"].astype(jnp.float32)
    k = gt.shape[1]
    topk = min(head.pre_anchor_topk, a)

    decoded = jax.lax.stop_gradient(
        delta2bbox(anchors[None], flat_reg, head.target_means,
                   head.target_stds))                        # (B, A, 4)

    # ---- negative term: box_prob per (anchor, class) ----
    iou_pg = jax.vmap(bbox_overlaps)(gt, decoded)            # (B, K, A)
    t1 = head.bbox_thr
    t2 = jnp.maximum(iou_pg.max(axis=-1, keepdims=True), t1 + 1e-12)
    obj_prob = jnp.clip((iou_pg - t1) / (t2 - t1), 0.0, 1.0)
    obj_prob = obj_prob * gtv[..., None]

    def scatter_max(probs, labels):                          # (K, A), (K,)
        return jnp.zeros((a, nc)).at[:, labels].max(probs.T)

    box_prob = jax.lax.stop_gradient(
        jax.vmap(scatter_max)(obj_prob, gtl))                # (B, A, C)
    neg_p = cls_prob * (1.0 - box_prob)
    neg_loss_map = jnp.power(neg_p, head.fa_gamma) * \
        (-jnp.log(jnp.clip(1.0 - neg_p, 1e-12, 1.0)))

    # ---- positive bags ----
    iou_ga = jax.vmap(bbox_overlaps)(gt, anchors[None].repeat(b, 0))
    _, bag_idx = jax.lax.top_k(iou_ga, topk)                 # (B, K, topk)
    def bag_cls_one(cp, bi, gl):                             # (A,C),(K,t),(K,)
        sel = cp[bi]                                         # (K, topk, C)
        return jnp.take_along_axis(sel, gl[:, None, None], axis=-1)[..., 0]

    bag_cls = jax.vmap(bag_cls_one)(cls_prob, bag_idx, gtl)  # (B, K, topk)
    bag_anchors = anchors[bag_idx]                           # (B, K, topk, 4)
    bag_reg = jax.vmap(lambda fr, bi: fr[bi])(flat_reg, bag_idx)
    tgt = bbox2delta(bag_anchors, gt[:, :, None, :],
                     head.target_means, head.target_stds)
    diff = jnp.abs(bag_reg - tgt)
    beta = head.bbox_beta
    sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                    diff - 0.5 * beta).sum(-1) * head.bbox_loss_weight
    box_p = jnp.exp(-sl1)                                     # (B, K, topk)
    matched = bag_cls * box_p
    w = 1.0 / jnp.clip(1.0 - matched, 1e-12, None)
    w = w / w.sum(axis=-1, keepdims=True)
    bag_prob = (w * matched).sum(-1)                          # (B, K)
    pos_loss = head.fa_alpha * \
        (-jnp.log(jnp.clip(bag_prob, 1e-12, 1.0))) * gtv

    num_gt = gtv.sum()
    if axis_name:
        num_gt = jax.lax.pmean(num_gt, axis_name)
    num_gt = jnp.maximum(num_gt, 1.0)
    loss_positive = pos_loss.sum() / num_gt
    loss_negative = (1 - head.fa_alpha) * neg_loss_map.sum() \
        / jnp.maximum(num_gt * topk, 1.0)
    return dict(loss_positive=loss_positive, loss_negative=loss_negative)
