"""Hungarian (bipartite) matching + DETR match costs.

Parity with ``/root/reference/mmdet/core/bbox/assigners/hungarian_assigner.py``
and ``mmdet/core/bbox/match_costs/match_cost.py`` (ClassificationCost,
BBoxL1Cost, IoUCost). The reference calls scipy's
``linear_sum_assignment`` on host per image; here the same exact solver runs
under jit through ``jax.pure_callback`` batched over images — one host
round-trip per loss evaluation, matching the reference's data flow. (The
K-padded GT columns are masked with a large cost and filtered after.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BIG = 1e8


def _lsa_batch(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """cost (B, Q, K), n_valid (B,) -> assigned gt per query (B, Q), -1 =
    unmatched."""
    from scipy.optimize import linear_sum_assignment

    b, q, k = cost.shape
    out = -np.ones((b, q), np.int32)
    for i in range(b):
        n = int(n_valid[i])
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        out[i, rows] = cols
    return out


def hungarian_match(cost: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """Jittable exact matching via host callback.

    Args: cost (B, Q, K) float32; gt_valid (B, K) bool.
    Returns assigned gt index per query (B, Q), -1 unmatched.
    """
    n_valid = gt_valid.sum(axis=1).astype(jnp.int32)
    b, q, k = cost.shape
    return jax.pure_callback(
        _lsa_batch,
        jax.ShapeDtypeStruct((b, q), jnp.int32),
        cost.astype(jnp.float32), n_valid)


# -- match costs (mmdet match_cost.py semantics) -----------------------------


def classification_cost(cls_logits, gt_labels, weight: float = 1.0):
    """-softmax prob of the gt class (ClassificationCost)."""
    probs = jax.nn.softmax(cls_logits, axis=-1)        # (Q, C+1)
    return -probs[:, gt_labels] * weight               # (Q, K)


def bbox_l1_cost(pred_cxcywh, gt_cxcywh_norm, weight: float = 1.0):
    """L1 in normalized cxcywh space (BBoxL1Cost)."""
    return jnp.abs(pred_cxcywh[:, None, :]
                   - gt_cxcywh_norm[None, :, :]).sum(-1) * weight


def iou_cost(pred_xyxy, gt_xyxy, weight: float = 1.0):
    """-GIoU (IoUCost with iou_mode='giou')."""
    from dsl_tpu.core.boxes import bbox_overlaps

    return -bbox_overlaps(pred_xyxy, gt_xyxy, mode="giou") * weight


def focal_cost(cls_logits, gt_labels, weight: float = 1.0,
               alpha: float = 0.25, gamma: float = 2.0, eps: float = 1e-8):
    """FocalLossCost (``match_cost.py``): pos_cost - neg_cost at the gt
    class over sigmoid scores. cls_logits (Q, C), gt_labels (K,) -> (Q, K).
    """
    p = jax.nn.sigmoid(cls_logits)
    pos_cost = -((1 - p) ** gamma) * alpha * jnp.log(jnp.maximum(p, eps))
    neg_cost = -(p ** gamma) * (1 - alpha) * jnp.log(
        jnp.maximum(1 - p, eps))
    return (pos_cost[:, gt_labels] - neg_cost[:, gt_labels]) * weight
