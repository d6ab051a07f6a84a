"""PAA: Probabilistic Anchor Assignment head.

Parity with ``/root/reference/mmdet/models/dense_heads/paa_head.py``:
ATSS-style cls/reg/iou branches; training scores every candidate anchor by
its joint (focal cls + GIoU reg) loss, fits a two-component 1-D Gaussian
mixture per GT over those scores, and takes the low-loss component as the
positives (``paa_reassign`` + ``gmm_separation_scheme``); losses are focal
cls (avg max(num_pos, B)), IoU-weighted GIoU reg (avg Σiou) and BCE on the
IoU branch (avg num_pos); test score is sqrt(cls·iou) (``_get_bboxes``
:522-588).

TPU redesign: sklearn's GaussianMixture (the reference's CPU dependency)
becomes a fixed-iteration masked EM inside jit — no host round-trip, fully
batched over GTs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.assigners import max_iou_assign
from dsl_tpu.core.boxes import bbox_overlaps, delta2bbox
from dsl_tpu.models.dense_heads.atss_head import ATSSHead

EPS = 1e-9


@HEADS.register
class PAAHead(ATSSHead):
    """Same module as ATSSHead (cls/reg/iou towers); PAA differs only in the
    training-time assignment, which lives in :func:`paa_loss`."""

    topk: int = 9
    score_voting: bool = True     # accepted for config parity


def em_fit_1d(scores, mask, iters: int = 10):
    """Masked 2-component 1-D EM. Returns responsibility of the LOW-mean
    component per sample (0 where masked out)."""
    valid = mask.astype(scores.dtype)
    n = jnp.maximum(valid.sum(), 1.0)
    big = jnp.where(mask, scores, jnp.inf)
    small = jnp.where(mask, scores, -jnp.inf)
    m0 = jnp.min(big)                      # low-loss component mean
    m1 = jnp.max(small)
    m0 = jnp.where(jnp.isfinite(m0), m0, 0.0)
    m1 = jnp.where(jnp.isfinite(m1), m1, 1.0)
    mean = (scores * valid).sum() / n
    var = ((scores - mean) ** 2 * valid).sum() / n + EPS
    s0 = s1 = jnp.sqrt(var) + EPS
    pi = 0.5

    def step(carry, _):
        m0, m1, s0, s1, pi = carry
        lp0 = -0.5 * ((scores - m0) / s0) ** 2 - jnp.log(s0) + jnp.log(pi)
        lp1 = -0.5 * ((scores - m1) / s1) ** 2 - jnp.log(s1) \
            + jnp.log(1 - pi)
        r0 = jax.nn.sigmoid(lp0 - lp1) * valid
        r1 = valid - r0
        w0 = jnp.maximum(r0.sum(), EPS)
        w1 = jnp.maximum(r1.sum(), EPS)
        m0n = (r0 * scores).sum() / w0
        m1n = (r1 * scores).sum() / w1
        s0n = jnp.sqrt((r0 * (scores - m0n) ** 2).sum() / w0) + EPS
        s1n = jnp.sqrt((r1 * (scores - m1n) ** 2).sum() / w1) + EPS
        pin = jnp.clip(w0 / jnp.maximum(w0 + w1, EPS), 0.05, 0.95)
        # keep component 0 the low-mean one
        swap = m0n > m1n
        return ((jnp.where(swap, m1n, m0n), jnp.where(swap, m0n, m1n),
                 jnp.where(swap, s1n, s0n), jnp.where(swap, s0n, s1n),
                 jnp.where(swap, 1 - pin, pin)), None)

    (m0, m1, s0, s1, pi), _ = jax.lax.scan(
        step, (m0, m1, s0, s1, pi), None, length=iters)
    lp0 = -0.5 * ((scores - m0) / s0) ** 2 - jnp.log(s0) + jnp.log(pi)
    lp1 = -0.5 * ((scores - m1) / s1) ** 2 - jnp.log(s1) + jnp.log(1 - pi)
    return jax.nn.sigmoid(lp0 - lp1) * valid


def paa_loss(head: PAAHead, cls_scores, bbox_preds, iou_preds, batch,
             axis_name: str | None = None):
    nc = head.num_classes
    gen = head.make_anchor_generator()
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = jnp.asarray(gen.flat_anchors(shapes))          # (A, 4)

    b = cls_scores[0].shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    flat_reg = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1)
    flat_iou = jnp.concatenate(
        [i.reshape(b, -1) for i in iou_preds], axis=1)

    # candidate assignment: MaxIoU with the reference PAA train_cfg
    # (pos_iou_thr = neg_iou_thr = 0.1, min_pos_iou = 0)
    labels0, assigned0, _ = max_iou_assign(
        anchors, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
        pos_iou_thr=0.1, neg_iou_thr=0.1, min_pos_iou=0.0,
        num_classes=nc, match_low_quality=True)[:3]

    decoded = delta2bbox(anchors[None], flat_reg, head.target_means,
                         head.target_stds)

    # per-anchor joint loss score vs its candidate gt (stop-grad)
    gt0 = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned0, 0)[..., None], axis=1)
    cand = assigned0 >= 0
    cls_l = L.sigmoid_focal_loss(flat_cls, labels0, reduction="none").sum(-1)
    reg_l = 1.3 * (1.0 - jax.vmap(
        lambda d, g: bbox_overlaps(d, g, mode="giou", is_aligned=True))(
        decoded, gt0))
    score = jax.lax.stop_gradient(cls_l + reg_l)             # (B, A)

    # per-gt EM over its candidates' scores -> keep the low-loss component
    k = batch["gt_bboxes"].shape[1]

    def per_image(scores_i, assigned_i, valid_i):
        def per_gt(g):
            mask = (assigned_i == g) & valid_i[g]
            return em_fit_1d(scores_i, mask) > 0.5
        return jax.vmap(per_gt)(jnp.arange(k))               # (K, A)

    keep = jax.vmap(per_image)(
        score, assigned0, batch["gt_valid"])                  # (B, K, A)
    keep_any = keep.any(axis=1)                               # (B, A)
    pos = cand & keep_any
    labels = jnp.where(pos, labels0, nc)
    pos_f = pos.astype(jnp.float32)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    num_pos = _psum(pos_f.sum())
    loss_cls = L.sigmoid_focal_loss(
        flat_cls, labels, avg_factor=jnp.maximum(num_pos, float(b)))

    iou_t = jax.lax.stop_gradient(jax.vmap(
        lambda d, g: bbox_overlaps(d, g, is_aligned=True))(
        decoded, gt0)) * pos_f
    denom = jnp.maximum(_psum(iou_t.sum()), 1e-6)
    loss_bbox = L.giou_loss(decoded, gt0,
                            weight=jnp.maximum(iou_t, EPS) * pos_f,
                            avg_factor=denom)
    loss_iou = L.binary_cross_entropy(flat_iou, iou_t, weight=pos_f,
                                      avg_factor=jnp.maximum(num_pos, 1.0))
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_iou=loss_iou)


def paa_get_bboxes(head: PAAHead, cls_scores, bbox_preds, iou_preds,
                   img_shapes=None, scale_factors=None, nms_pre=1000,
                   score_thr=0.05, iou_threshold=0.6, max_per_img=100):
    """ATSS-style decode with score = sqrt(sigmoid(cls)·sigmoid(iou))."""
    from dsl_tpu.models.dense_heads.atss_head import atss_get_bboxes

    # reuse the ATSS decode by pre-combining: it multiplies scores by
    # sigmoid(centerness); PAA wants sqrt(cls·iou). Feed cls' = cls (logits)
    # and cent' = iou (logits); then rescale: sqrt(cls·iou) = (cls·iou)^0.5 —
    # monotone in cls·iou, so ranking/NMS are identical; only the reported
    # score differs by the sqrt, applied below via a dedicated decode.
    import jax
    import jax.numpy as jnp
    from dsl_tpu.core.boxes import delta2bbox
    from dsl_tpu.core.nms import multiclass_nms

    nc = head.num_classes
    b = cls_scores[0].shape[0]
    gen = head.make_anchor_generator()
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    lvl_anchors = gen.grid_anchors(shapes)

    boxes_all, scores_all = [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.sigmoid(cls_scores[lvl].reshape(b, -1, nc))
        iou = jax.nn.sigmoid(iou_preds[lvl].reshape(b, -1))
        pred = bbox_preds[lvl].reshape(b, -1, 4)
        anc = jnp.asarray(lvl_anchors[lvl])[None].repeat(b, axis=0)
        comb = jnp.sqrt(jnp.maximum(scores * iou[..., None], 0.0))
        kk = min(nms_pre, comb.shape[1])
        rank = jnp.max(comb, axis=-1)
        _, idx = jax.lax.top_k(rank, kk)
        take = lambda a: jnp.take_along_axis(
            a, idx.reshape(b, kk, *(1,) * (a.ndim - 2)), axis=1)
        comb, pred, anc = take(comb), take(pred), take(anc)
        box = delta2bbox(anc, pred, head.target_means, head.target_stds)
        if img_shapes is not None:
            xlim = img_shapes[:, None, 1:2]
            ylim = img_shapes[:, None, 0:1]
            box = jnp.concatenate(
                [jnp.clip(box[..., 0:1], 0, xlim),
                 jnp.clip(box[..., 1:2], 0, ylim),
                 jnp.clip(box[..., 2:3], 0, xlim),
                 jnp.clip(box[..., 3:4], 0, ylim)], axis=-1)
        boxes_all.append(box)
        scores_all.append(comb)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc):
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img)

    return jax.vmap(_single)(boxes, scores)
