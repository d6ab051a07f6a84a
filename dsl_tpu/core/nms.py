"""Fixed-shape NMS family for XLA: hard NMS, batched (class-offset) NMS,
multiclass NMS, soft-NMS.

Replaces the reference's CUDA bitmask kernel
(``/root/reference/mmdet/ops/nms/src/nms_kernel.cu:1-130``) and mmcv's
``nms``/``batched_nms`` (used at
``mmdet/core/post_processing/bbox_nms.py:7-96`` and
``mmdet/runner/hooks/unlabel_pred_hook.py:163``).

TPU-native design: all shapes are static. Greedy NMS is computed as a
*Jacobi fixpoint* of the recurrence

    keep[j] = not exists i < j (in score order) with keep[i] and iou(i,j) > thr

iterated via ``lax.while_loop`` with a matvec per step (MXU/VPU friendly,
converges in the length of the longest suppression chain — typically < 16
iterations — and provably in at most N). Sorting replaces atomics; masked
``-inf`` scores replace dynamic candidate counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dsl_tpu.core.boxes import bbox_overlaps

NEG_INF = -1e30

# Implementation selection. Both produce identical greedy-NMS results:
# - Jacobi fixpoint (default): a few MXU matvec iterations over the IoU
#   matrix — measured 4.1 ms for 2000 boxes on TPU v5e.
# - Pallas sequential kernel (dsl_tpu/ops/nms_pallas.py): exact one-pass
#   greedy, no O(N^2) HBM matrix — measured 49.9 ms for the same input
#   (2000 latency-bound fori_loop steps lose to ~10 large matvecs).
# The matrix-parallel formulation is the right TPU shape for this op; the
# kernel is kept as a verified alternative for VMEM-constrained contexts.
FORCE_PALLAS_NMS: bool | None = None


def _use_pallas() -> bool:
    return bool(FORCE_PALLAS_NMS)


def _greedy_keep(boxes_sorted: jnp.ndarray, valid_sorted: jnp.ndarray,
                 iou_threshold: float) -> jnp.ndarray:
    """Greedy-NMS keep mask over boxes already sorted by descending score.

    Returns bool (N,) — True where the box survives suppression.
    """
    n = boxes_sorted.shape[0]
    iou = bbox_overlaps(boxes_sorted, boxes_sorted)          # (N, N)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # overlap[i, j]: higher-scored valid box i would suppress j.
    overlap = ((iou > iou_threshold) & (row < col)
               & valid_sorted[:, None]).astype(jnp.float32)

    keep0 = valid_sorted

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < n)

    def body(state):
        keep, _, it = state
        suppressed = (keep.astype(jnp.float32) @ overlap) > 0.0
        new_keep = valid_sorted & ~suppressed
        return new_keep, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0)))
    return keep


@partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.5,
        max_out: int = 100, valid: jnp.ndarray | None = None):
    """Hard NMS with static output size.

    Args:
      boxes: (N, 4); scores: (N,); valid: optional bool (N,) candidate mask.
      max_out: number of output slots (padded with score=NEG_INF rows).

    Returns:
      dets: (max_out, 5) [x1, y1, x2, y2, score], padded rows have score NEG_INF
      idx: (max_out,) int32 indices into the input (0 for padded rows)
      out_valid: (max_out,) bool — which output rows are real detections
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    boxes_s = boxes[order]
    scores_s = masked_scores[order]
    valid_s = valid[order]

    if _use_pallas():
        from dsl_tpu.ops.nms_pallas import pallas_nms_keep

        keep = pallas_nms_keep(boxes_s, valid_s, iou_threshold)
    else:
        keep = _greedy_keep(boxes_s, valid_s, iou_threshold)

    kept_scores = jnp.where(keep, scores_s, NEG_INF)
    # scores_s is descending, so top-k of kept_scores preserves score order.
    k = min(max_out, n)
    top_scores, top_pos = jax.lax.top_k(kept_scores, k)
    if k < max_out:
        pad = max_out - k
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((pad,), NEG_INF, top_scores.dtype)])
        top_pos = jnp.concatenate([top_pos, jnp.zeros((pad,), top_pos.dtype)])
    out_valid = top_scores > NEG_INF / 2
    out_boxes = jnp.where(out_valid[:, None], boxes_s[top_pos], 0.0)
    dets = jnp.concatenate([out_boxes, top_scores[:, None]], axis=-1)
    idx = jnp.where(out_valid, order[top_pos], 0)
    return dets, idx, out_valid


@partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                iou_threshold: float = 0.5, max_out: int = 100,
                valid: jnp.ndarray | None = None):
    """Class-aware NMS via the class-offset trick
    (mmcv ``batched_nms``: shift each class's boxes to a disjoint region).

    Returns (dets, idx, out_valid) as :func:`nms`, plus output labels.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = labels.astype(boxes.dtype)[:, None] * max_coord
    shifted = boxes + offsets
    dets, idx, out_valid = nms(shifted, scores, iou_threshold, max_out, valid)
    out_boxes = jnp.where(out_valid[:, None], boxes[idx], 0.0)
    out_dets = jnp.concatenate([out_boxes, dets[:, 4:5]], axis=-1)
    out_labels = jnp.where(out_valid, labels[idx], 0)
    return out_dets, idx, out_valid, out_labels


@partial(jax.jit, static_argnames=("score_thr", "iou_threshold", "top_k",
                                   "max_num"))
def fast_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
             score_thr: float = 0.05, iou_threshold: float = 0.5,
             top_k: int = 200, max_num: int = 100):
    """Fast NMS (``mmdet/models/dense_heads/yolact_head.py fast_nms`` /
    ``core/post_processing/bbox_nms.py:97-170``): per class, keep a box iff
    its max IoU with any HIGHER-scored same-class box is <= threshold —
    suppressed boxes still suppress others, trading a little accuracy for a
    fully parallel matrix formulation (one (C, K, K) IoU + triu-max; no
    sequential dependency — ideal on the MXU).

    Args:
      boxes: (N, 4) shared across classes (the YOLACT layout).
      scores: (N, C) per-class scores (background column already dropped).
    Returns (dets (max_num, 5), labels (max_num,), box_idx (max_num,),
    valid (max_num,)).
    """
    from dsl_tpu.core.boxes import bbox_overlaps

    n, c = scores.shape
    k = min(top_k, n)
    top_s, idx = jax.lax.top_k(scores.T, k)            # (C, K) sorted desc
    bx = boxes[idx]                                    # (C, K, 4)
    iou = jnp.triu(bbox_overlaps(bx, bx), k=1)         # (C, K, K)
    keep = (iou.max(axis=1) <= iou_threshold) & (top_s > score_thr)
    flat = jnp.where(keep, top_s, NEG_INF).reshape(-1)
    m = min(max_num, flat.shape[0])
    out_s, out_i = jax.lax.top_k(flat, m)
    labels = out_i // k
    box_idx = idx.reshape(-1)[out_i]
    valid = out_s > NEG_INF / 2
    dets = jnp.concatenate(
        [boxes[box_idx] * valid[:, None], jnp.where(valid, out_s, 0.0)[:, None]],
        axis=-1)
    return dets, jnp.where(valid, labels, 0), box_idx, valid


@partial(jax.jit,
         static_argnames=("score_thr", "iou_threshold", "max_per_img",
                          "pre_nms_top", "nms_type", "sigma", "min_score"))
def multiclass_nms(multi_bboxes: jnp.ndarray, multi_scores: jnp.ndarray,
                   score_thr: float = 0.05, iou_threshold: float = 0.5,
                   max_per_img: int = 100, pre_nms_top: int = 2000,
                   valid: jnp.ndarray | None = None, nms_type: str = "nms",
                   sigma: float = 0.5, min_score: float = 1e-3,
                   score_factors: jnp.ndarray | None = None):
    """Multi-class NMS over per-point class scores, static shapes throughout.

    Parity with ``mmdet/core/post_processing/bbox_nms.py:7-96``: every
    (point, class) pair with score > ``score_thr`` is a candidate; candidates
    go through class-offset batched NMS; top ``max_per_img`` survive. The one
    deviation forced by static shapes: candidates are pre-truncated to the
    ``pre_nms_top`` highest-scoring pairs (default 2000 ≫ max_per_img; in
    practice identical output).

    Args:
      multi_bboxes: (P, 4) class-agnostic boxes or (P, C, 4) per-class.
      multi_scores: (P, C) raw class scores (no background column).
      valid: optional (P,) point validity mask.
      score_factors: optional (P,) multiplier (centerness / objectness).
        mmdet semantics: ``score_thr`` applies to the RAW scores, the
        factor multiplies AFTER thresholding ("preserve more bboxes,
        improve mAP by 1% for YOLOv3" — ``bbox_nms.py:55-62``).

    Returns:
      dets: (max_per_img, 5); labels: (max_per_img,); out_valid: (max_per_img,)
    """
    p, c = multi_scores.shape
    if valid is None:
        valid = jnp.ones((p,), dtype=bool)
    cand = valid[:, None] & (multi_scores > score_thr)
    if score_factors is not None:
        multi_scores = multi_scores * score_factors[:, None]
    flat_scores = jnp.where(cand, multi_scores, NEG_INF).reshape(-1)  # (P*C,)
    k = min(pre_nms_top, p * c)
    top_scores, flat_idx = jax.lax.top_k(flat_scores, k)
    point_idx = flat_idx // c
    cls_idx = flat_idx % c
    if multi_bboxes.ndim == 3:
        cand_boxes = multi_bboxes[point_idx, cls_idx]
    else:
        cand_boxes = multi_bboxes[point_idx]
    cand_valid = top_scores > NEG_INF / 2
    if nms_type in ("soft_nms", "soft_nms_gaussian"):
        # class-offset trick so cross-class overlaps never decay each other
        # (``bbox_nms.py`` adds ``cls * max_coord`` offsets before nms)
        max_coord = jnp.max(jnp.where(cand_valid[:, None], cand_boxes, 0.0))
        offs = cls_idx.astype(cand_boxes.dtype)[:, None] * (max_coord + 1.0)
        method = "gaussian" if nms_type == "soft_nms_gaussian" else "linear"
        dets, idx, out_valid = soft_nms(
            cand_boxes + offs, jnp.where(cand_valid, top_scores, NEG_INF),
            iou_threshold=iou_threshold, sigma=sigma, score_thr=min_score,
            method=method, max_out=max_per_img, valid=cand_valid)
        dets = dets.at[:, :4].add(-offs[idx] * out_valid[:, None])
        return dets, jnp.where(out_valid, cls_idx[idx], 0), out_valid
    dets, _, out_valid, out_labels = batched_nms(
        cand_boxes, top_scores, cls_idx, iou_threshold, max_per_img, cand_valid)
    return dets, out_labels, out_valid


@partial(jax.jit, static_argnames=("method", "iou_threshold", "sigma",
                                   "score_thr", "max_out"))
def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float = 0.3, sigma: float = 0.5,
             score_thr: float = 1e-3, method: str = "linear",
             max_out: int = 100, valid: jnp.ndarray | None = None):
    """Soft-NMS (linear / gaussian decay), sequential-greedy by construction.

    Parity with ``mmdet/ops/nms/src/soft_nms_cpu.pyx:1-127``. Runs
    ``max_out`` greedy picks with a ``fori_loop``; each pick decays the scores
    of overlapping remaining boxes instead of removing them.

    Returns (dets (max_out, 5), idx (max_out,), out_valid (max_out,)).
    """
    assert method in ("linear", "gaussian", "naive")
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    live_scores = jnp.where(valid, scores, NEG_INF)
    iou = bbox_overlaps(boxes, boxes)

    def body(i, state):
        live, out_idx, out_score = state
        pick = jnp.argmax(live)
        pick_score = live[pick]
        out_idx = out_idx.at[i].set(pick)
        out_score = out_score.at[i].set(pick_score)
        ov = iou[pick]
        if method == "linear":
            decay = jnp.where(ov > iou_threshold, 1.0 - ov, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(ov * ov) / sigma)
        else:
            decay = jnp.where(ov > iou_threshold, 0.0, 1.0)
        live = jnp.where(live > NEG_INF / 2, live * decay, live)
        live = live.at[pick].set(NEG_INF)
        live = jnp.where(live < score_thr, NEG_INF, live)
        return live, out_idx, out_score

    out_idx = jnp.zeros((max_out,), jnp.int32)
    out_score = jnp.full((max_out,), NEG_INF, scores.dtype)
    _, out_idx, out_score = jax.lax.fori_loop(
        0, max_out, body, (live_scores, out_idx, out_score))
    out_valid = out_score > NEG_INF / 2
    out_boxes = jnp.where(out_valid[:, None], boxes[out_idx], 0.0)
    dets = jnp.concatenate([out_boxes, out_score[:, None]], axis=-1)
    return dets, jnp.where(out_valid, out_idx, 0), out_valid
