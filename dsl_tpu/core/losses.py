"""Functional losses (pure jnp), XLA-fused — no custom kernels needed.

Replaces the reference's CUDA ``sigmoid_focal_loss``
(``/root/reference/mmdet/models/losses/focal_loss.py:4``, mmcv CUDA op) and
the loss zoo in ``mmdet/models/losses/``. The elementwise loss + mask +
reduction pattern fuses completely under XLA, so a hand-written kernel would
buy nothing; everything here is written densely over fixed-shape masked
tensors (no boolean indexing), which is the TPU-native equivalent of the
reference's ``pos_inds`` gather style.

All losses follow mmdet's contract: optional elementwise ``weight``, a
``reduction`` in {'none', 'mean', 'sum'}, and an ``avg_factor`` overriding the
denominator of 'mean' (``mmdet/models/losses/utils.py:weight_reduce_loss``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_reduce_loss(loss: jnp.ndarray, weight: jnp.ndarray | None = None,
                       reduction: str = "mean",
                       avg_factor: float | jnp.ndarray | None = None):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        if avg_factor is None:
            return jnp.mean(loss)
        return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)
    raise ValueError(reduction)


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       gamma: float = 2.0, alpha: float = 0.25,
                       weight: jnp.ndarray | None = None,
                       reduction: str = "mean",
                       avg_factor=None) -> jnp.ndarray:
    """Sigmoid focal loss.

    Args:
      logits: (..., C) raw scores.
      targets: int (...,) class indices where ``C`` means background (mmdet
        convention), or float (..., C) one-hot/soft targets.
      weight: broadcastable to (...,) — per-sample weight (expanded over C),
        or to (..., C).
    """
    c = logits.shape[-1]
    if jnp.issubdtype(targets.dtype, jnp.integer):
        onehot = jax.nn.one_hot(targets, c, dtype=logits.dtype)
    else:
        onehot = targets
    p = jax.nn.sigmoid(logits)
    # stable BCE-with-logits
    ce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    loss = alpha_t * jnp.power(1 - p_t, gamma) * ce          # (..., C)
    if weight is not None and weight.ndim == loss.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def py_sigmoid_focal_loss(logits, targets, gamma=2.0, alpha=0.25,
                          weight=None, reduction="mean", avg_factor=None):
    """Alias — the reference keeps a python fallback of the CUDA op; here the
    one implementation serves both roles."""
    return sigmoid_focal_loss(logits, targets, gamma, alpha, weight,
                              reduction, avg_factor)


def binary_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                         weight: jnp.ndarray | None = None,
                         reduction: str = "mean", avg_factor=None):
    """BCE with logits (used for centerness)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  weight: jnp.ndarray | None = None,
                  reduction: str = "mean", avg_factor=None):
    """Softmax CE over the last axis; integer targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return weight_reduce_loss(nll, weight, reduction, avg_factor)


def _iou_for_loss(pred: jnp.ndarray, target: jnp.ndarray, mode: str,
                  eps: float = 1e-6) -> jnp.ndarray:
    """Aligned IoU / GIoU of (..., 4) decoded boxes."""
    from dsl_tpu.core.boxes import bbox_overlaps
    return bbox_overlaps(pred, target, mode=mode, is_aligned=True, eps=eps)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
             weight: jnp.ndarray | None = None, eps: float = 1e-6,
             reduction: str = "mean", avg_factor=None):
    """-log(IoU) loss on decoded boxes (``mmdet/models/losses/iou_loss.py``)."""
    ious = jnp.clip(_iou_for_loss(pred, target, "iou", eps), eps, 1.0)
    loss = -jnp.log(ious)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray,
              weight: jnp.ndarray | None = None, eps: float = 1e-6,
              reduction: str = "mean", avg_factor=None):
    """1 - GIoU on decoded boxes (``mmdet/models/losses/iou_loss.py`` GIoULoss)."""
    gious = _iou_for_loss(pred, target, "giou", eps)
    loss = 1.0 - gious
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def _diou_terms(pred, target, eps):
    """(ious, rho2/c2, pred wh, target wh) shared by DIoU/CIoU
    (``mmdet/models/losses/iou_loss.py:107-219``)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    ious = overlap / (ap + ag - overlap + eps)
    ew = jnp.clip(jnp.maximum(pred[..., 2], target[..., 2])
                  - jnp.minimum(pred[..., 0], target[..., 0]), 0.0)
    eh = jnp.clip(jnp.maximum(pred[..., 3], target[..., 3])
                  - jnp.minimum(pred[..., 1], target[..., 1]), 0.0)
    c2 = ew ** 2 + eh ** 2 + eps
    rho2 = ((target[..., 0] + target[..., 2])
            - (pred[..., 0] + pred[..., 2])) ** 2 / 4 \
        + ((target[..., 1] + target[..., 3])
           - (pred[..., 1] + pred[..., 3])) ** 2 / 4
    return ious, rho2 / c2


def diou_loss(pred: jnp.ndarray, target: jnp.ndarray,
              weight: jnp.ndarray | None = None, eps: float = 1e-7,
              reduction: str = "mean", avg_factor=None):
    """1 - DIoU (center-distance penalty) on decoded boxes
    (``iou_loss.py:107-158`` DIoULoss)."""
    ious, dist = _diou_terms(pred, target, eps)
    return weight_reduce_loss(1.0 - (ious - dist), weight, reduction,
                              avg_factor)


def ciou_loss(pred: jnp.ndarray, target: jnp.ndarray,
              weight: jnp.ndarray | None = None, eps: float = 1e-7,
              reduction: str = "mean", avg_factor=None):
    """1 - CIoU (distance + aspect-consistency penalties) on decoded boxes
    (``iou_loss.py:162-219`` CIoULoss — gradients flow through the full
    ``v²/(1-IoU+v)`` term exactly as in the reference)."""
    import math

    ious, dist = _diou_terms(pred, target, eps)
    w1 = pred[..., 2] - pred[..., 0]
    h1 = pred[..., 3] - pred[..., 1] + eps
    w2 = target[..., 2] - target[..., 0]
    h2 = target[..., 3] - target[..., 1] + eps
    v = (4 / math.pi ** 2) \
        * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    cious = ious - (dist + v ** 2 / (1.0 - ious + v))
    return weight_reduce_loss(1.0 - cious, weight, reduction, avg_factor)


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0,
                   weight: jnp.ndarray | None = None,
                   reduction: str = "mean", avg_factor=None):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
            weight: jnp.ndarray | None = None,
            reduction: str = "mean", avg_factor=None):
    return weight_reduce_loss(jnp.abs(pred - target), weight, reduction,
                              avg_factor)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
             weight: jnp.ndarray | None = None,
             reduction: str = "mean", avg_factor=None):
    return weight_reduce_loss((pred - target) ** 2, weight, reduction,
                              avg_factor)


def quality_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       quality: jnp.ndarray, beta: float = 2.0,
                       weight: jnp.ndarray | None = None,
                       reduction: str = "mean", avg_factor=None):
    """Quality Focal Loss (GFL): the positive class's target is its
    localization quality score; modulation |y - sigmoid|^beta.

    Args:
      logits: (..., C); labels: int (...,) with C = background;
      quality: (...,) in [0, 1] — target score for the labeled class.
    """
    c = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, c, dtype=logits.dtype)
    y = onehot * quality[..., None]
    sigma = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * y + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    mod = jnp.power(jnp.abs(y - sigma), beta)
    loss = mod * ce
    if weight is not None and weight.ndim == loss.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def distribution_focal_loss(logits: jnp.ndarray, target: jnp.ndarray,
                            weight: jnp.ndarray | None = None,
                            reduction: str = "mean", avg_factor=None):
    """Distribution Focal Loss (GFL): CE against the two integer bins
    bracketing the continuous regression target.

    Args:
      logits: (..., n_bins); target: float (...,) in [0, n_bins - 1].
    """
    n = logits.shape[-1]
    tl = jnp.clip(jnp.floor(target), 0, n - 2).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(logits.dtype) - target
    wr = target - tl.astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -(jnp.take_along_axis(logp, tl[..., None], -1)[..., 0] * wl
            + jnp.take_along_axis(logp, tr[..., None], -1)[..., 0] * wr)
    return weight_reduce_loss(nll, weight, reduction, avg_factor)


def varifocal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                   alpha: float = 0.75, gamma: float = 2.0,
                   iou_weighted: bool = True,
                   weight: jnp.ndarray | None = None,
                   reduction: str = "mean", avg_factor=None):
    """Varifocal loss (``mmdet/models/losses/varifocal_loss.py``): IoU-aware
    BCE — positives weighted by their (IoU) target, negatives focally
    down-weighted by ``alpha * |sigma - target|^gamma``.

    Args: logits/targets (..., C); targets carry the IoU score at positive
    positions and 0 elsewhere.
    """
    sigma = jax.nn.sigmoid(logits)
    pos = (targets > 0).astype(logits.dtype)
    if iou_weighted:
        focal_w = targets * pos + alpha * jnp.power(
            jnp.abs(jax.lax.stop_gradient(sigma) - targets), gamma) * (1 - pos)
    else:
        focal_w = pos + alpha * jnp.power(
            jnp.abs(jax.lax.stop_gradient(sigma) - targets), gamma) * (1 - pos)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = ce * focal_w
    if weight is not None and weight.ndim == loss.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def gaussian_focal_loss(pred: jnp.ndarray, gaussian_target: jnp.ndarray,
                        alpha: float = 2.0, gamma: float = 4.0,
                        weight: jnp.ndarray | None = None,
                        reduction: str = "mean", avg_factor=None):
    """Gaussian focal loss for center heatmaps (CenterNet/CornerNet,
    ``mmdet/models/losses/gaussian_focal_loss.py``). ``pred`` is already a
    sigmoid probability; targets are gaussian-splatted, peak == 1."""
    eps = 1e-12
    pos_w = (gaussian_target == 1).astype(pred.dtype)
    neg_w = jnp.power(1 - gaussian_target, gamma)
    pos_loss = -jnp.log(pred + eps) * jnp.power(1 - pred, alpha) * pos_w
    neg_loss = -jnp.log(1 - pred + eps) * jnp.power(pred, alpha) * neg_w
    return weight_reduce_loss(pos_loss + neg_loss, weight, reduction,
                              avg_factor)


def ghm_c_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               label_weight: jnp.ndarray, bins: int = 10,
               momentum: float = 0.0, acc_sum: jnp.ndarray | None = None,
               reduction: str = "mean"):
    """GHM-C (``mmdet/models/losses/ghm_loss.py`` GHMC): BCE re-weighted by
    inverse gradient-density. Vectorized binning (no python loop over bins on
    the data path). With ``momentum > 0`` pass/receive the EMA bin counts:
    returns ``(loss, new_acc_sum)``; plain loss otherwise.
    """
    targets = targets.astype(logits.dtype)
    g = jnp.abs(jax.lax.stop_gradient(jax.nn.sigmoid(logits)) - targets)
    valid = (label_weight > 0)
    tot = jnp.maximum(valid.sum().astype(logits.dtype), 1.0)
    bin_idx = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), logits.dtype).at[
        bin_idx.reshape(-1)].add(valid.reshape(-1).astype(logits.dtype))
    if momentum > 0:
        assert acc_sum is not None
        new_acc = jnp.where(counts > 0,
                            momentum * acc_sum + (1 - momentum) * counts,
                            acc_sum)
        eff = new_acc
    else:
        eff = counts
    n_nonempty = jnp.maximum((counts > 0).sum().astype(logits.dtype), 1.0)
    bin_w = jnp.where(counts > 0, tot / jnp.maximum(eff, 1e-12), 0.0)
    weights = jnp.where(valid, bin_w[bin_idx], 0.0) / n_nonempty
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = weight_reduce_loss(ce, weights, reduction, avg_factor=tot)
    if momentum > 0:
        return loss, new_acc
    return loss


def ghm_r_loss(pred: jnp.ndarray, target: jnp.ndarray,
               label_weight: jnp.ndarray, mu: float = 0.02, bins: int = 10,
               momentum: float = 0.0, acc_sum: jnp.ndarray | None = None,
               reduction: str = "mean"):
    """GHM-R (GHMR): authentic smooth-L1 ``sqrt(d² + mu²) - mu`` with the
    same gradient-density re-weighting on ``|d / sqrt(d² + mu²)|``."""
    diff = pred - target
    loss_pt = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jnp.abs(jax.lax.stop_gradient(
        diff / jnp.sqrt(mu * mu + diff * diff)))
    valid = (label_weight > 0)
    tot = jnp.maximum(valid.sum().astype(pred.dtype), 1.0)
    bin_idx = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), pred.dtype).at[
        bin_idx.reshape(-1)].add(valid.reshape(-1).astype(pred.dtype))
    if momentum > 0:
        assert acc_sum is not None
        new_acc = jnp.where(counts > 0,
                            momentum * acc_sum + (1 - momentum) * counts,
                            acc_sum)
        eff = new_acc
    else:
        eff = counts
    n_nonempty = jnp.maximum((counts > 0).sum().astype(pred.dtype), 1.0)
    bin_w = jnp.where(counts > 0, tot / jnp.maximum(eff, 1e-12), 0.0)
    weights = jnp.where(valid, bin_w[bin_idx], 0.0) / n_nonempty
    loss = weight_reduce_loss(loss_pt, weights, reduction, avg_factor=tot)
    if momentum > 0:
        return loss, new_acc
    return loss


def balanced_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     beta: float = 1.0, alpha: float = 0.5,
                     gamma: float = 1.5,
                     weight: jnp.ndarray | None = None,
                     reduction: str = "mean", avg_factor=None):
    """Balanced L1 (Libra R-CNN, ``mmdet/models/losses/balanced_l1_loss.py``)."""
    diff = jnp.abs(pred - target)
    import math

    b = math.e ** (gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log1p(b * diff / beta) - alpha * diff,
        gamma * diff + gamma / b - alpha * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def kd_kl_div_loss(pred: jnp.ndarray, soft_label: jnp.ndarray, T: float = 10,
                   weight: jnp.ndarray | None = None,
                   reduction: str = "mean", avg_factor=None):
    """Knowledge-distillation KL divergence
    (``mmdet/models/losses/kd_loss.py``): KL(softmax(soft/T) ||
    softmax(pred/T)) · T², mean over classes per sample."""
    target = jax.lax.stop_gradient(jax.nn.softmax(soft_label / T, axis=-1))
    logp = jax.nn.log_softmax(pred / T, axis=-1)
    logq = jnp.log(jnp.maximum(target, 1e-12))
    kl = (target * (logq - logp)).mean(axis=-1) * (T * T)
    return weight_reduce_loss(kl, weight, reduction, avg_factor)


def seesaw_ce_loss(cls_score: jnp.ndarray, labels: jnp.ndarray,
                   cum_samples: jnp.ndarray, p: float = 0.8, q: float = 2.0,
                   eps: float = 1e-2,
                   weight: jnp.ndarray | None = None,
                   reduction: str = "mean", avg_factor=None):
    """Seesaw CE over the class channels
    (``mmdet/models/losses/seesaw_loss.py`` seesaw_ce_loss): negatives of
    rarer classes are mitigated by ``(N_j / N_i)^p``; overconfident negatives
    compensated by ``(σ_j / σ_i)^q``."""
    nc = cls_score.shape[-1]
    onehot = jax.nn.one_hot(labels, nc, dtype=cls_score.dtype)
    seesaw = jnp.ones_like(cls_score)
    if p > 0:
        cs = jnp.maximum(cum_samples.astype(cls_score.dtype), 1.0)
        ratio = cs[None, :] / cs[:, None]                     # (C, C)
        sample_w = jnp.where(ratio < 1.0, jnp.power(ratio, p), 1.0)
        seesaw = seesaw * sample_w[labels]
    if q > 0:
        scores = jax.lax.stop_gradient(jax.nn.softmax(cls_score, axis=-1))
        self_s = jnp.take_along_axis(scores, labels[..., None], -1)
        score_ratio = scores / jnp.maximum(self_s, eps)
        comp = jnp.where(score_ratio > 1.0, jnp.power(score_ratio, q), 1.0)
        seesaw = seesaw * comp
    adjusted = cls_score + jnp.log(jnp.maximum(seesaw, 1e-12)) * (1 - onehot)
    logp = jax.nn.log_softmax(adjusted, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
    return weight_reduce_loss(nll, weight, reduction, avg_factor)


def seesaw_loss(cls_score: jnp.ndarray, labels: jnp.ndarray,
                cum_samples: jnp.ndarray, num_classes: int, p: float = 0.8,
                q: float = 2.0, eps: float = 1e-2,
                weight: jnp.ndarray | None = None, avg_factor=None):
    """Full SeesawLoss split head: ``cls_score`` is (N, C+2) — C class
    channels + 2 objectness channels. Returns
    ``(loss_cls_classes, loss_cls_objectness, new_cum_samples)``; the caller
    owns the cumulative per-class counts (reference keeps them as a buffer,
    here they are explicit state — jit-friendly)."""
    assert cls_score.shape[-1] == num_classes + 2
    pos = (labels < num_classes)
    obj_labels = pos.astype(jnp.int32) * 0 + (1 - pos.astype(jnp.int32))
    score_classes = cls_score[..., :-2]
    score_obj = cls_score[..., -2:]
    new_cum = cum_samples.at[jnp.clip(labels, 0, num_classes)].add(1.0)

    obj_logp = jax.nn.log_softmax(score_obj, axis=-1)
    loss_obj = weight_reduce_loss(
        -jnp.take_along_axis(obj_logp, obj_labels[..., None], -1)[..., 0],
        weight, "mean", avg_factor)

    pos_w = pos.astype(cls_score.dtype)
    if weight is not None:
        pos_w = pos_w * weight
    loss_classes = seesaw_ce_loss(
        score_classes, jnp.clip(labels, 0, num_classes - 1),
        new_cum[:num_classes], p=p, q=q, eps=eps, weight=pos_w,
        reduction="mean",
        avg_factor=jnp.maximum(pos_w.sum(), 1.0))
    return loss_classes, loss_obj, new_cum


def ae_loss(tl_emb: jnp.ndarray, br_emb: jnp.ndarray, valid: jnp.ndarray,
            pull_weight: float = 0.25, push_weight: float = 0.25,
            margin: float = 1.0):
    """Associative Embedding loss (CornerNet), K-padded.

    Reference ``mmdet/models/losses/ae_loss.py:10-102`` works per image on a
    python list of matched corner coords; here the caller gathers the
    embeddings at the (K-padded) GT corner pixels so the loss is dense masked
    arithmetic over fixed shapes.

    Args:
      tl_emb, br_emb: (..., K, M) embeddings at top-left / bottom-right GT
        corners.  valid: (..., K) float validity mask.
    Returns (pull, push) summed over the batch dims (reference sums over
    images with per-image 1/N and 1/(N(N-1)) normalizers).
    """
    v = valid.astype(tl_emb.dtype)
    n = jnp.maximum(v.sum(-1), 1.0)                       # objects per image
    mean = (tl_emb + br_emb) / 2.0
    pull = ((tl_emb - mean) ** 2 + (br_emb - mean) ** 2).sum(-1)
    pull = (pull * v).sum(-1) / n

    # push: margin - |mean_i - mean_j| over valid i != j pairs
    diff = jnp.abs((mean[..., :, None, :] - mean[..., None, :, :]).sum(-1))
    pair_v = v[..., :, None] * v[..., None, :]
    k = v.shape[-1]
    pair_v = pair_v * (1.0 - jnp.eye(k, dtype=tl_emb.dtype))
    push = jnp.maximum(margin - diff, 0.0) * pair_v
    denom = jnp.maximum(n * (n - 1.0), 1.0)
    push = jnp.where(n > 1, push.sum((-1, -2)) / denom, 0.0)
    return pull_weight * pull.sum(), push_weight * push.sum()


def bounded_iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     beta: float = 0.2, eps: float = 1e-3,
                     weight: jnp.ndarray | None = None,
                     reduction: str = "mean", avg_factor=None):
    """Bounded IoU loss (``mmdet/models/losses/iou_loss.py:41-85``), the
    GuidedAnchoring shape loss. Returns a per-box 4-vector loss
    [dx, dy, dw, dh] passed through a smooth-L1 envelope."""
    pcx = (pred[..., 0] + pred[..., 2]) * 0.5
    pcy = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0]
    ph = pred[..., 3] - pred[..., 1]
    t = jax.lax.stop_gradient(target)
    tcx = (t[..., 0] + t[..., 2]) * 0.5
    tcy = (t[..., 1] + t[..., 3]) * 0.5
    tw = t[..., 2] - t[..., 0]
    th = t[..., 3] - t[..., 1]
    dx = tcx - pcx
    dy = tcy - pcy
    loss_dx = 1 - jnp.maximum(
        (tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx) + eps), 0.0)
    loss_dy = 1 - jnp.maximum(
        (th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy) + eps), 0.0)
    loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    loss = jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


class SeesawCounter:
    """Host-side running per-class sample counts for SeesawLoss.

    The reference keeps ``cum_samples`` as a module buffer updated from the
    labels seen in each loss call (``seesaw_loss.py:214-222``); under jit the
    counts are explicit traced state instead: feed each batch's gt labels
    here and pass ``.counts`` in as ``batch['cum_samples']``."""

    def __init__(self, num_classes: int):
        import numpy as np

        self.counts = np.ones((num_classes + 1,), np.float32)
        self.num_classes = num_classes

    def update(self, gt_labels, gt_valid=None):
        import numpy as np

        labels = np.asarray(gt_labels).reshape(-1)
        if gt_valid is not None:
            labels = labels[np.asarray(gt_valid).reshape(-1).astype(bool)]
        np.add.at(self.counts, np.clip(labels, 0, self.num_classes), 1.0)
        return self.counts


def accuracy(pred, target, topk=1, thresh=None):
    """Top-k classification accuracy (``mmdet/models/losses/accuracy.py``):
    fraction of rows whose top-k predictions include ``target`` (optionally
    requiring the score to exceed ``thresh``). Returns a scalar for int
    topk, a tuple for tuple topk."""
    single = isinstance(topk, int)
    ks = (topk,) if single else tuple(topk)
    maxk = max(ks)
    if pred.shape[0] == 0:
        z = jnp.zeros((), jnp.float32)
        return z if single else tuple(z for _ in ks)
    vals, idx = jax.lax.top_k(pred, maxk)                # (N, maxk)
    correct = idx == target[:, None]
    if thresh is not None:
        correct = correct & (vals > thresh)
    n = pred.shape[0]
    res = tuple(100.0 * jnp.sum(jnp.any(correct[:, :k], axis=1)) / n
                for k in ks)
    return res[0] if single else res
