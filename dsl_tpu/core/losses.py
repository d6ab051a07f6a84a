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
