"""PISA: importance-based sample reweighting (ISR-P) and CARL.

Parity with ``/root/reference/mmdet/models/losses/pisa_loss.py:8-183``:
ISR-P ranks positives by IoU hierarchically (within each (class, gt) group,
then within the class) and maps the rank linearly to a cls-loss weight
``((max_l_num - rank)/max_l_num)``, shifted/powered by (bias, k) and
rescaled so the total positive cls loss is unchanged; CARL multiplies the
positive regression loss by the (normalized) classification score at the gt
class.

TPU redesign: the reference's per-group python sort loops become two
segmented argsort passes over the dense (masked) anchor set — fully
jittable, O(N log N).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e7


def group_rank_desc(group_id, score, valid):
    """Per-element descending rank of ``score`` within its ``group_id``
    (0 = largest in group). Invalid elements rank arbitrarily (masked
    downstream).

    Two stable argsorts implement an exact lexsort (gid asc, score desc) —
    a float composite key would lose the score bits at fp32."""
    n = group_id.shape[0]
    gid = jnp.where(valid, group_id, jnp.iinfo(jnp.int32).max // 2)
    o1 = jnp.argsort(-score, stable=True)
    o2 = jnp.argsort(gid[o1], stable=True)
    order = o1[o2]                                    # group-major, desc score
    g_sorted = gid[order]
    idx = jnp.arange(n)
    is_start = jnp.concatenate(
        [jnp.asarray([True]), g_sorted[1:] != g_sorted[:-1]])
    start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, -1))
    within = idx - start_idx
    rank = jnp.zeros((n,), jnp.int32).at[order].set(within.astype(jnp.int32))
    return rank


def isr_p_weights(labels, pos_mask, gt_ids, ious, num_classes: int,
                  k: float = 2.0, bias: float = 0.0):
    """Positive cls-loss weights via IoU-HLR (reference ``isr_p``).

    Args (flat over all anchors of the batch):
      labels (N,) int; pos_mask (N,) bool; gt_ids (N,) globally-unique gt id
      per positive; ious (N,) IoU(decoded pred, decoded target).
    Returns (N,) weights: ISR weight on positives, 1.0 elsewhere (before
    the loss-preserving rescale, which the caller applies on the actual
    loss values).
    """
    posf = pos_mask.astype(jnp.float32)
    # max_l_num = largest per-class positive count
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, num_classes - 1),
                            num_classes) * posf[:, None]
    max_l_num = jnp.maximum(onehot.sum(axis=0).max(), 1.0)

    # step 1: rank within (label, gt) groups, boost iou by inverse rank
    lg_group = labels.astype(jnp.int32) * 100003 + gt_ids.astype(jnp.int32)
    r1 = group_rank_desc(lg_group, ious, pos_mask)
    ious2 = ious + (max_l_num - r1.astype(jnp.float32))

    # step 2: rank within label groups -> IoU-HLR
    r2 = group_rank_desc(labels.astype(jnp.int32), ious2, pos_mask)
    w = (max_l_num - r2.astype(jnp.float32)) / max_l_num
    w = (bias + w * (1 - bias)) ** k
    return jnp.where(pos_mask, w, 1.0)


def isr_p_rescale(per_anchor_cls_loss, base_weights, isr_weights, pos_mask):
    """Rescale ISR weights so the summed positive cls loss is unchanged
    (reference ``isr_p`` :103-115). Returns the final per-anchor weights."""
    posf = pos_mask.astype(jnp.float32)
    pl = jax.lax.stop_gradient(per_anchor_cls_loss)
    ori = (pl * base_weights * posf).sum()
    new = (pl * isr_weights * posf).sum()
    ratio = ori / jnp.maximum(new, 1e-12)
    w = isr_weights * ratio
    return jnp.where(pos_mask, w * base_weights, base_weights)


def carl_weights(cls_logits, labels, pos_mask, num_classes: int,
                 k: float = 1.0, bias: float = 0.2, sigmoid: bool = True):
    """CARL per-positive regression weights, normalized to sum to num_pos
    (reference ``carl_loss`` :120-183). Gradient flows into the cls score."""
    cls_idx = jnp.clip(labels, 0, num_classes - 1)
    if sigmoid:
        p = jax.nn.sigmoid(cls_logits)
    else:
        p = jax.nn.softmax(cls_logits, axis=-1)
    score = jnp.take_along_axis(p, cls_idx[..., None], axis=-1)[..., 0]
    w = (bias + (1 - bias) * score) ** k
    posf = pos_mask.astype(jnp.float32)
    num_pos = jnp.maximum(posf.sum(), 1.0)
    ratio = num_pos / jnp.maximum((w * posf).sum(), 1e-12)
    return jnp.where(pos_mask, w * ratio, 0.0)


def score_hlr_weights(decoded, max_scores, neg_mask, iou_thr: float = 0.5,
                      k: float = 0.5, bias: float = 0.0,
                      score_thr: float = 0.05):
    """ISR-N / Score-HLR negative reweighting (reference
    ``samplers/score_hlr_sampler.py:100-215``): negatives are grouped by
    overlap of their *predicted* boxes, ranked by max foreground score
    within the group then globally (importance = n - rank + score), and the
    HLR rank maps to ``(bias + (1-bias)(U - r)/U)^k``.

    TPU redesign: the reference's ``nms_match`` greedy grouping becomes a
    dense "dominator" assignment — each negative joins the highest-scoring
    negative whose predicted box overlaps it above ``iou_thr`` (itself if
    none dominates). Negatives below ``score_thr`` keep weight 1 (easy
    background, reference ``invalid_inds`` path).

    Args (flat): decoded (N, 4) predicted boxes at the argmax fg class;
    max_scores (N,) max fg softmax score; neg_mask (N,) bool.
    Returns (N,) weights (1.0 outside the valid-negative set).
    """
    from dsl_tpu.core.boxes import bbox_overlaps

    n = decoded.shape[0]
    valid = neg_mask & (max_scores > score_thr)
    iou = bbox_overlaps(jax.lax.stop_gradient(decoded),
                        jax.lax.stop_gradient(decoded))       # (N, N)
    overlap = (iou > iou_thr) & valid[None, :] & valid[:, None]
    # dominator: highest-score valid overlapping negative (incl. self)
    cand = jnp.where(overlap, max_scores[None, :], -1.0)
    group_id = jnp.argmax(cand, axis=1).astype(jnp.int32)
    # within-group rank by score (0 = best)
    r1 = group_rank_desc(group_id, max_scores, valid)
    # importance: higher for group leaders, tie-broken by score
    imp = jnp.where(valid,
                    valid.sum().astype(jnp.float32)
                    - r1.astype(jnp.float32) + max_scores, -_BIG)
    # global HLR rank of importance
    order = jnp.argsort(-imp)
    rank = jnp.zeros((n,), jnp.float32).at[order].set(
        jnp.arange(n, dtype=jnp.float32))
    u = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    w = (bias + (1 - bias) * (u - rank) / u)
    w = jnp.where(w > 0, w, 0.0) ** k
    # below-threshold (easy) negatives get the MINIMUM importance weight
    # (reference :207: ``neg_label_weights[num_hlr:] = imp_weights.min()``)
    w_min = jnp.min(jnp.where(valid, w, jnp.inf))
    w_min = jnp.where(jnp.isfinite(w_min), w_min, 1.0)
    easy = neg_mask & ~valid
    out = jnp.where(valid, w, jnp.where(easy, w_min, 1.0))
    return out
