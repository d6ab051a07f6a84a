"""Assigners and samplers for anchor-based heads — fixed-shape, vmappable.

Parity targets:
- MaxIoUAssigner ``/root/reference/mmdet/core/bbox/assigners/max_iou_assigner.py:1-212``
- ATSSAssigner ``atss_assigner.py`` (adaptive per-GT IoU threshold =
  mean + std of the IoU of the topk-by-center-distance candidates per level)
- PseudoSampler ``samplers/pseudo_sampler.py`` (use every pos/neg — the only
  sampler dense heads need; implicit here since everything is dense masks).

Assignment results are dense per-anchor arrays: ``assigned_gt`` index (−1 =
negative, −2 = ignore), labels, and max-IoU — no dynamic-length pos lists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dsl_tpu.core.boxes import bbox_overlaps


def _max_iou_assign_single(anchors, gt_bboxes, gt_labels, gt_valid,
                           pos_iou_thr, neg_iou_thr, min_pos_iou,
                           num_classes, match_low_quality,
                           gt_max_assign_all=True, inside=None):
    """(A,) labels (num_classes = bg), (A,) assigned gt idx, (A,) weights.

    ``inside``: optional (A,) bool — anchors outside the image per
    ``anchor_inside_flags`` (train_cfg ``allowed_border >= 0``) are
    excluded: background label, zero weight, never a gt's best match
    (the reference filters then unmaps — dense equivalent)."""
    ious = bbox_overlaps(anchors, gt_bboxes)             # (A, K)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    if inside is not None:
        ious = jnp.where(inside[:, None], ious, -1.0)
    max_iou = jnp.max(ious, axis=1)                      # (A,)
    argmax = jnp.argmax(ious, axis=1)

    # base assignment
    is_pos = max_iou >= pos_iou_thr
    is_neg = (max_iou < neg_iou_thr) & (max_iou >= 0)

    if match_low_quality:
        # each gt forces its best anchor positive when iou >= min_pos_iou
        gt_best_iou = jnp.max(ious, axis=0)              # (K,)
        if gt_max_assign_all:
            # all anchors sharing the max iou (mmdet default)
            is_best = ious == gt_best_iou[None, :]
        else:
            # only the single argmax anchor per gt (SSD:
            # MaxIoUAssigner(gt_max_assign_all=False) — caught by the SSD
            # torch oracle: ties at the gt max otherwise over-assign)
            best_anchor = jnp.argmax(ious, axis=0)       # (K,)
            is_best = jnp.arange(ious.shape[0])[:, None] == best_anchor[None]
        is_best = is_best & \
            (gt_best_iou[None, :] >= min_pos_iou) & gt_valid[None, :]
        forced = jnp.any(is_best, axis=1)
        # reference assign_wrt_overlaps iterates gts IN ORDER and
        # overwrites (``max_iou_assigner.py:212-221``): the LAST gt whose
        # best this anchor is wins, and the forced assignment replaces
        # even an above-threshold positive's argmax gt (oracled in
        # test_torch_oracle_rcnn variant 3)
        kk = is_best.shape[1]
        forced_gt = (kk - 1) - jnp.argmax(is_best[:, ::-1], axis=1)
        argmax = jnp.where(forced, forced_gt, argmax)
        is_pos = is_pos | forced
        is_neg = is_neg & ~forced

    labels = jnp.where(is_pos, gt_labels[argmax], num_classes)
    weights = jnp.where(is_pos | is_neg, 1.0, 0.0)       # between-thrs ignored
    assigned = jnp.where(is_pos, argmax, -1)
    return labels.astype(jnp.int32), assigned.astype(jnp.int32), \
        weights.astype(jnp.float32), max_iou


@partial(jax.jit, static_argnames=("pos_iou_thr", "neg_iou_thr",
                                   "min_pos_iou", "num_classes",
                                   "match_low_quality",
                                   "gt_max_assign_all"))
def max_iou_assign(anchors, gt_bboxes, gt_labels, gt_valid,
                   pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
                   num_classes=80, match_low_quality=True,
                   gt_max_assign_all=True, inside=None):
    """Batched MaxIoU assignment.

    anchors: (A, 4); gt_*: (B, K, ...); ``inside``: optional (B, A)
    per-image anchor validity (allowed_border filtering). Returns labels
    (B, A), assigned_gt (B, A), weights (B, A), max_iou (B, A).
    """
    single = partial(_max_iou_assign_single, anchors,
                     pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
                     min_pos_iou=min_pos_iou, num_classes=num_classes,
                     match_low_quality=match_low_quality,
                     gt_max_assign_all=gt_max_assign_all)
    if inside is not None:
        return jax.vmap(lambda gb, gl, gv, ins: single(gb, gl, gv,
                                                       inside=ins))(
            gt_bboxes, gt_labels, gt_valid, inside)
    return jax.vmap(single)(gt_bboxes, gt_labels, gt_valid)


def _atss_assign_single(anchors, num_anchors_per_level, topk, gt_bboxes,
                        gt_labels, gt_valid, num_classes):
    """ATSS: candidates = topk closest anchors per level per gt; threshold =
    mean+std of candidate IoUs; positives must have center inside gt."""
    a = anchors.shape[0]
    ious = bbox_overlaps(anchors, gt_bboxes)             # (A, K)
    ious = jnp.where(gt_valid[None, :], ious, 0.0)
    anchor_cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    anchor_cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    gt_cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    gt_cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    dist = jnp.sqrt((anchor_cx[:, None] - gt_cx[None, :]) ** 2
                    + (anchor_cy[:, None] - gt_cy[None, :]) ** 2)  # (A, K)

    # top-k closest per level -> candidate mask (A, K)
    cand = jnp.zeros_like(dist, dtype=bool)
    start = 0
    for n in num_anchors_per_level:
        lvl_dist = jax.lax.dynamic_slice_in_dim(dist, start, n, axis=0)
        k = min(topk, n)
        # threshold distance = k-th smallest per gt within the level
        kth = -jax.lax.top_k(-lvl_dist.T, k)[0][:, -1]   # (K,)
        lvl_cand = lvl_dist <= kth[None, :]
        cand = jax.lax.dynamic_update_slice_in_dim(
            cand, lvl_cand, start, axis=0)
        start += n

    cand_ious = jnp.where(cand, ious, jnp.nan)
    mean = jnp.nanmean(cand_ious, axis=0)                # (K,)
    std = jnp.sqrt(jnp.nanmean((cand_ious - mean[None, :]) ** 2, axis=0))
    thr = mean + std                                     # (K,)

    inside = ((anchor_cx[:, None] > gt_bboxes[None, :, 0])
              & (anchor_cx[:, None] < gt_bboxes[None, :, 2])
              & (anchor_cy[:, None] > gt_bboxes[None, :, 1])
              & (anchor_cy[:, None] < gt_bboxes[None, :, 3]))
    pos_mask = cand & (ious >= thr[None, :]) & inside & gt_valid[None, :]

    # each anchor takes the gt with max IoU among its positive matches
    pos_ious = jnp.where(pos_mask, ious, -1.0)
    max_iou = jnp.max(pos_ious, axis=1)
    argmax = jnp.argmax(pos_ious, axis=1)
    is_pos = max_iou > 0
    labels = jnp.where(is_pos, gt_labels[argmax], num_classes)
    assigned = jnp.where(is_pos, argmax, -1)
    weights = jnp.ones((a,), jnp.float32)
    return labels.astype(jnp.int32), assigned.astype(jnp.int32), weights, \
        jnp.where(is_pos, max_iou, jnp.max(ious, axis=1))


def atss_assign(anchors, num_anchors_per_level, gt_bboxes, gt_labels,
                gt_valid, topk=9, num_classes=80):
    single = partial(_atss_assign_single, anchors,
                     tuple(num_anchors_per_level), topk,
                     num_classes=num_classes)
    return jax.vmap(single)(gt_bboxes, gt_labels, gt_valid)


def _approx_max_iou_assign_single(approxs, gt_bboxes, gt_labels, gt_valid,
                                  pos_iou_thr, neg_iou_thr, min_pos_iou,
                                  num_classes, inside=None):
    """ApproxMaxIoUAssigner (``approx_max_iou_assigner.py``): the IoU of a
    square location is the max over its G approx anchors; the rest is
    MaxIoU (same last-gt-wins forced-match semantics as
    ``_max_iou_assign_single`` — ``assign_wrt_overlaps`` is shared)."""
    a, g, _ = approxs.shape
    ious = bbox_overlaps(approxs.reshape(a * g, 4), gt_bboxes)
    ious = ious.reshape(a, g, -1).max(axis=1)            # (A, K)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    if inside is not None:
        ious = jnp.where(inside[:, None], ious, -1.0)
    max_iou = jnp.max(ious, axis=1)
    argmax = jnp.argmax(ious, axis=1)
    is_pos = max_iou >= pos_iou_thr
    is_neg = (max_iou < neg_iou_thr) & (max_iou >= 0)
    gt_best_iou = jnp.max(ious, axis=0)
    is_best = (ious == gt_best_iou[None, :]) & \
        (gt_best_iou[None, :] >= min_pos_iou) & gt_valid[None, :]
    forced = jnp.any(is_best, axis=1)
    kk = is_best.shape[1]
    forced_gt = (kk - 1) - jnp.argmax(is_best[:, ::-1], axis=1)
    argmax = jnp.where(forced, forced_gt, argmax)
    is_pos = is_pos | forced
    is_neg = is_neg & ~forced
    labels = jnp.where(is_pos, gt_labels[argmax], num_classes)
    weights = jnp.where(is_pos | is_neg, 1.0, 0.0)
    assigned = jnp.where(is_pos, argmax, -1)
    return labels.astype(jnp.int32), assigned.astype(jnp.int32), \
        weights.astype(jnp.float32), max_iou


@partial(jax.jit, static_argnames=("pos_iou_thr", "neg_iou_thr",
                                   "min_pos_iou", "num_classes"))
def approx_max_iou_assign(approxs, gt_bboxes, gt_labels, gt_valid,
                          pos_iou_thr=0.5, neg_iou_thr=0.4,
                          min_pos_iou=0.0, num_classes=80, inside=None):
    """approxs: (A, G, 4) — G approx anchors per square location.
    ``inside``: optional (B, A) per-image position validity."""
    single = partial(_approx_max_iou_assign_single, approxs,
                     pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
                     min_pos_iou=min_pos_iou, num_classes=num_classes)
    if inside is not None:
        return jax.vmap(lambda gb, gl, gv, ins: single(gb, gl, gv,
                                                       inside=ins))(
            gt_bboxes, gt_labels, gt_valid, inside)
    return jax.vmap(single)(gt_bboxes, gt_labels, gt_valid)


def _grid_assign_single(boxes, responsible, gt_bboxes, gt_labels, gt_valid,
                        pos_iou_thr, neg_iou_thr, min_pos_iou, num_classes):
    """GridAssigner (``assigners/grid_assigner.py:44-160``): MaxIoU whose
    positives are constrained to grid cells responsible for the gt (YOLO
    semantics). ``responsible``: (A,) bool flags."""
    ious = bbox_overlaps(boxes, gt_bboxes)               # (A, K)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    max_iou_all = jnp.max(ious, axis=1)

    # negatives from the unconstrained IoU (step 2)
    is_neg = (max_iou_all <= neg_iou_thr) & (max_iou_all >= 0)

    # positives only among responsible boxes (steps 3-4)
    r = responsible.astype(bool)
    ious_r = jnp.where(r[:, None], ious, -1.0)
    max_iou = jnp.max(ious_r, axis=1)
    argmax = jnp.argmax(ious_r, axis=1)
    is_pos = (max_iou > pos_iou_thr) & r

    # step 4: each gt claims its best responsible box (gt_max_assign_all)
    gt_best = jnp.max(ious_r, axis=0)                    # (K,)
    is_best = (ious_r == gt_best[None, :]) & r[:, None] & \
        (gt_best[None, :] > min_pos_iou) & gt_valid[None, :]
    forced = jnp.any(is_best, axis=1)
    forced_gt = jnp.argmax(is_best, axis=1)
    argmax = jnp.where(forced & ~is_pos, forced_gt, argmax)
    is_pos = is_pos | forced
    is_neg = is_neg & ~is_pos

    labels = jnp.where(is_pos, gt_labels[argmax], num_classes)
    weights = jnp.where(is_pos | is_neg, 1.0, 0.0)
    assigned = jnp.where(is_pos, argmax, -1)
    return labels.astype(jnp.int32), assigned.astype(jnp.int32), \
        weights.astype(jnp.float32), jnp.maximum(max_iou, 0.0)


@partial(jax.jit, static_argnames=("pos_iou_thr", "neg_iou_thr",
                                   "min_pos_iou", "num_classes"))
def grid_assign(boxes, responsible, gt_bboxes, gt_labels, gt_valid,
                pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0,
                num_classes=80):
    """Batched GridAssigner. boxes (A, 4), responsible (B, A) or (A,),
    gt_* (B, K, ...)."""
    if responsible.ndim == 1:
        responsible = jnp.broadcast_to(
            responsible[None], (gt_bboxes.shape[0],) + responsible.shape)
    single = partial(_grid_assign_single,
                     pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
                     min_pos_iou=min_pos_iou, num_classes=num_classes)
    return jax.vmap(lambda resp, gtb, gtl, gtv: single(
        boxes, resp, gtb, gtl, gtv))(responsible, gt_bboxes, gt_labels,
                                     gt_valid)
