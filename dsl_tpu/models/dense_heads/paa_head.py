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

EPS = 1e-12                          # reference paa_head.py EPS


@HEADS.register
class PAAHead(ATSSHead):
    """Same module as ATSSHead (cls/reg/iou towers); PAA differs only in the
    training-time assignment, which lives in :func:`paa_loss`."""

    topk: int = 9
    score_voting: bool = True     # reference paa_head.py:608-674


LOG2PI = 1.8378770664093453          # log(2*pi)


def gmm_fit_predict_1d(x, mask, iters: int = 100, reg_covar: float = 1e-6,
                       tol: float = 1e-3):
    """2-component diag GMM on masked 1-D data, replicating
    ``sklearn.mixture.GaussianMixture(2, weights_init=[.5,.5],
    means_init=[min,max], precisions_init=[1,1])`` as the reference's
    ``paa_reassign`` uses it (``paa_head.py:307-330``): EM from the given
    init (no kmeans), per-M-step ``reg_covar`` variance floor, and —
    critically — sklearn's EARLY STOP when the mean log-likelihood
    improves by < ``tol``. The stopping rule is semantic, not cosmetic:
    this EM often drifts to a different basin if run to the 100-iteration
    cap, so we freeze the parameters at the same iteration sklearn would
    break (after that iteration's M-step).

    Returns (fg0 (bool, argmax==component0), log_density) per sample."""
    v = mask.astype(x.dtype)
    n = jnp.maximum(v.sum(), 1.0)
    xz = jnp.where(mask, x, 0.0)
    m0 = jnp.min(jnp.where(mask, x, jnp.inf))
    m1 = jnp.max(jnp.where(mask, x, -jnp.inf))
    m0 = jnp.where(jnp.isfinite(m0), m0, 0.0)
    m1 = jnp.where(jnp.isfinite(m1), m1, 1.0)

    def log_prob(p):
        m0, m1, v0, v1, w0, w1 = p
        lp0 = -0.5 * (LOG2PI + jnp.log(v0) + (x - m0) ** 2 / v0) \
            + jnp.log(w0)
        lp1 = -0.5 * (LOG2PI + jnp.log(v1) + (x - m1) ** 2 / v1) \
            + jnp.log(w1)
        return lp0, lp1

    def step(carry, _):
        params, prev_lb, done = carry
        lp0, lp1 = log_prob(params)
        lse = jnp.logaddexp(lp0, lp1)
        lb = (lse * v).sum() / n
        r0 = jnp.exp(lp0 - lse) * v
        r1 = jnp.exp(lp1 - lse) * v
        nk0 = r0.sum() + 1e-10
        nk1 = r1.sum() + 1e-10
        m0n = (r0 * xz).sum() / nk0
        m1n = (r1 * xz).sum() / nk1
        new = (m0n, m1n,
               (r0 * (xz - m0n) ** 2).sum() / nk0 + reg_covar,
               (r1 * (xz - m1n) ** 2).sum() / nk1 + reg_covar,
               nk0 / n, nk1 / n)
        params = jax.tree_util.tree_map(
            lambda o, nw: jnp.where(done, o, nw), params, new)
        new_done = done | (jnp.abs(lb - prev_lb) < tol)
        prev_lb = jnp.where(done, prev_lb, lb)
        return (params, prev_lb, new_done), None

    one = jnp.asarray(1.0, x.dtype)
    half = jnp.asarray(0.5, x.dtype)
    init = ((m0, m1, one, one, half, half),
            jnp.asarray(-jnp.inf, x.dtype), jnp.asarray(False))
    (params, _, _), _ = jax.lax.scan(step, init, None, length=iters)
    lp0, lp1 = log_prob(params)
    return (lp0 >= lp1), jnp.logaddexp(lp0, lp1)


def paa_loss(head: PAAHead, cls_scores, bbox_preds, iou_preds, batch,
             axis_name: str | None = None):
    """The reference PAA pipeline (``paa_head.py:85-407``), dense:

    1. MaxIoU(0.1/0.1, min_pos_iou 0) candidate assignment;
    2. per-anchor joint loss score (elementwise focal Σclasses + 1.3·GIoU
       on decoded boxes — ``get_pos_loss`` :233-288);
    3. ``paa_reassign``: per gt, per LEVEL the topk lowest-loss candidates,
       pooled and sorted; a 2-component sklearn-style GMM over the scores;
       scheme (c): positives are the sorted-prefix of component-0 samples
       up to the component's density mode; gts with <2 candidates drop ALL
       their positives;
    4. focal cls avg'd by max(num_pos, B); GIoU ×1.3 weighted by the
       (detached) decoded-vs-gt IoU and avg'd by its sum; BCE ×0.5 on the
       IoU branch avg'd by num_pos.
    """
    nc = head.num_classes
    gen = head.make_anchor_generator()
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = jnp.asarray(gen.flat_anchors(shapes))          # (A, 4)
    na = gen.num_base_anchors
    lvl_sizes = [h * w * na for h, w in shapes]

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
    # loss config dicts (reference paa config :43-51: FocalLoss w1,
    # GIoULoss w1.3, sigmoid-CE w0.5) or fail loudly
    cls_cfg = dict(head.loss_cls or {})
    if cls_cfg.get("type", "FocalLoss") != "FocalLoss":
        raise NotImplementedError(
            f"PAA loss_cls {cls_cfg.get('type')!r} unsupported")
    bbox_cfg = dict(head.loss_bbox or {})
    if bbox_cfg.get("type", "GIoULoss") != "GIoULoss":
        raise NotImplementedError(
            f"PAA loss_bbox {bbox_cfg.get('type')!r} unsupported")
    iou_cfg = dict(head.loss_centerness or {})
    if iou_cfg.get("type", "CrossEntropyLoss") != "CrossEntropyLoss":
        raise NotImplementedError(
            f"PAA loss_centerness {iou_cfg.get('type')!r} unsupported")
    cls_lw = float(cls_cfg.get("loss_weight", 1.0))
    bbox_lw = float(bbox_cfg.get("loss_weight", 1.3))
    iou_lw = float(iou_cfg.get("loss_weight", 0.5))

    cls_l = L.sigmoid_focal_loss(flat_cls, labels0, reduction="none").sum(-1)
    reg_l = bbox_lw * (1.0 - jax.vmap(
        lambda d, g: bbox_overlaps(d, g, mode="giou", is_aligned=True))(
        decoded, gt0))
    score = jax.lax.stop_gradient(cls_l + reg_l)             # (B, A)

    k = batch["gt_bboxes"].shape[1]
    topk = head.topk

    def per_image(scores_i, assigned_i, valid_i):
        # per level, per gt: topk lowest-loss candidates
        cand_s, cand_idx = [], []
        start = 0
        for sz in lvl_sizes:
            s_lvl = scores_i[start:start + sz]               # (Al,)
            a_lvl = assigned_i[start:start + sz]
            t = min(topk, sz)
            masked = jnp.where(
                (a_lvl[None, :] == jnp.arange(k)[:, None])
                & valid_i[:, None], s_lvl[None, :], jnp.inf)  # (K, Al)
            neg_v, idx = jax.lax.top_k(-masked, t)
            cand_s.append(-neg_v)                            # (K, t)
            cand_idx.append(idx + start)
            start += sz
        cand_s = jnp.concatenate(cand_s, axis=1)             # (K, T)
        cand_idx = jnp.concatenate(cand_idx, axis=1)
        cand_ok = jnp.isfinite(cand_s)

        def per_gt(s, idx, ok):
            order = jnp.argsort(jnp.where(ok, s, jnp.inf))
            s = s[order]
            idx = idx[order]
            ok = ok[order]
            n_cand = ok.sum()
            fg0, logdens = gmm_fit_predict_1d(jnp.where(ok, s, 0.0), ok)
            fgs = fg0 & ok
            fg_rank = jnp.cumsum(fgs.astype(jnp.int32)) - 1
            best = jnp.argmax(jnp.where(fgs, logdens, -jnp.inf))
            thr_rank = fg_rank[best]
            sel = fgs & (fg_rank <= thr_rank) & fgs.any() & (n_cand >= 2)
            return jnp.zeros((scores_i.shape[0],), bool).at[
                jnp.where(sel, idx, 0)].max(sel)

        return jax.vmap(per_gt)(cand_s, cand_idx, cand_ok).any(axis=0)

    pos = jax.vmap(per_image)(
        score, assigned0, batch["gt_valid"])                  # (B, A)
    labels = jnp.where(pos, labels0, nc)
    pos_f = pos.astype(jnp.float32)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    num_pos = _psum(pos_f.sum())
    loss_cls = cls_lw * L.sigmoid_focal_loss(
        flat_cls, labels, avg_factor=jnp.maximum(num_pos, float(b)))

    iou_t = jax.lax.stop_gradient(jax.vmap(
        lambda d, g: bbox_overlaps(d, g, is_aligned=True))(
        decoded, gt0)) * pos_f
    denom = jnp.maximum(_psum(iou_t.sum()), 1e-6)
    loss_bbox = bbox_lw * L.giou_loss(decoded, gt0,
                                      weight=jnp.maximum(iou_t, EPS) * pos_f,
                                      avg_factor=denom)
    loss_iou = iou_lw * L.binary_cross_entropy(
        flat_iou, iou_t, weight=pos_f, avg_factor=jnp.maximum(num_pos, 1.0))
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
        dets, labels, valid = multiclass_nms(bx, sc, score_thr=score_thr,
                                             iou_threshold=iou_threshold,
                                             max_per_img=max_per_img)
        if head.score_voting:
            voted = paa_score_voting(dets, labels, valid, bx, sc, score_thr)
            dets = jnp.concatenate([voted, dets[:, 4:5]], axis=-1)
        return dets, labels, valid

    return jax.vmap(_single)(boxes, scores)


def paa_score_voting(dets, labels, valid, mlvl_bboxes, mlvl_nms_scores,
                     score_thr: float):
    """PAA score voting (reference ``paa_head.py score_voting:608-674``):
    each surviving detection's box becomes the score-and-IoU-weighted mean
    of all SAME-CLASS candidate boxes (nms_score > score_thr) with
    IoU > 0.01; weights ``exp(-(1-iou)^2/0.025) * score``. The detection
    score is unchanged.

    Dense static-shape form: (D, P) IoU x per-class candidate masks.
    Args: dets (D, 5), labels (D,), valid (D,), mlvl_bboxes (P, 4),
    mlvl_nms_scores (P, C). Returns voted boxes (D, 4).
    """
    ious = bbox_overlaps(dets[:, :4], mlvl_bboxes)          # (D, P)
    cls_scores = mlvl_nms_scores.T[jnp.clip(labels, 0, None)]  # (D, P)
    w = (jnp.exp(-(1.0 - ious) ** 2 / 0.025) * cls_scores
         * (ious > 0.01) * (cls_scores > score_thr))
    den = w.sum(axis=1, keepdims=True)
    # exact division — weights can be ~1e-17 (exp(-(1-0.01)^2/0.025)) and a
    # floor on the denominator would distort the vote; only guard den == 0
    voted = (w @ mlvl_bboxes) / jnp.where(den > 0, den, 1.0)
    keep = valid[:, None] & (den > 0)
    return jnp.where(keep, voted, dets[:, :4])
