"""FCOS dense target assignment — fully vectorized, fixed-shape, batched.

Parity with ``/root/reference/mmdet/models/dense_heads/fcos_head.py:562-705``
(``get_targets`` / ``_get_target_single``), re-designed for XLA: instead of
per-image python loops over variable-length GT lists, ground truth comes in
K-padded ``(B, K, 4)`` boxes + ``(B, K)`` labels + ``(B, K)`` validity masks,
and assignment is one vmapped masked computation. Padded GT rows get area=INF
so they never win the min-area argmin.

Conventions (mmdet v2): foreground classes are ``[0, num_classes)``; the
background label is ``num_classes``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INF = 1e8


def centerness_target(bbox_targets: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min_lr / max_lr) * (min_tb / max_tb)) per point.

    ``bbox_targets``: (..., 4) as (l, t, r, b). Safe on non-positive rows
    (returns 0) so it can be computed densely and masked later.
    (Reference: ``fcos_head.py:centerness_target``.)
    """
    lr = bbox_targets[..., 0::2]
    tb = bbox_targets[..., 1::2]
    min_lr = jnp.min(lr, axis=-1)
    max_lr = jnp.maximum(jnp.max(lr, axis=-1), 1e-12)
    min_tb = jnp.min(tb, axis=-1)
    max_tb = jnp.maximum(jnp.max(tb, axis=-1), 1e-12)
    val = (min_lr / max_lr) * (min_tb / max_tb)
    return jnp.sqrt(jnp.maximum(val, 0.0))


def _fcos_target_single(points: jnp.ndarray, regress_ranges: jnp.ndarray,
                        strides: jnp.ndarray, gt_bboxes: jnp.ndarray,
                        gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                        num_classes: int, center_sampling: bool,
                        center_sample_radius: float):
    """Single-image assignment.

    Args:
      points: (P, 2) xy; regress_ranges: (P, 2); strides: (P,)
      gt_bboxes: (K, 4); gt_labels: (K,) int32; gt_valid: (K,) bool

    Returns labels (P,) int32 and bbox_targets (P, 4) un-normalized (l,t,r,b).
    """
    xs = points[:, 0][:, None]                       # (P, 1)
    ys = points[:, 1][:, None]
    gx1, gy1 = gt_bboxes[None, :, 0], gt_bboxes[None, :, 1]   # (1, K)
    gx2, gy2 = gt_bboxes[None, :, 2], gt_bboxes[None, :, 3]

    left = xs - gx1
    right = gx2 - xs
    top = ys - gy1
    bottom = gy2 - ys
    bbox_targets = jnp.stack([left, top, right, bottom], axis=-1)  # (P, K, 4)

    if center_sampling:
        radius_stride = strides[:, None] * center_sample_radius    # (P, 1)
        cx = (gx1 + gx2) * 0.5
        cy = (gy1 + gy2) * 0.5
        cx1 = jnp.maximum(cx - radius_stride, gx1)
        cy1 = jnp.maximum(cy - radius_stride, gy1)
        cx2 = jnp.minimum(cx + radius_stride, gx2)
        cy2 = jnp.minimum(cy + radius_stride, gy2)
        cb = jnp.stack([xs - cx1, ys - cy1, cx2 - xs, cy2 - ys], axis=-1)
        inside_gt = jnp.min(cb, axis=-1) > 0
    else:
        inside_gt = jnp.min(bbox_targets, axis=-1) > 0

    max_dist = jnp.max(bbox_targets, axis=-1)                      # (P, K)
    inside_range = ((max_dist >= regress_ranges[:, None, 0])
                    & (max_dist <= regress_ranges[:, None, 1]))

    areas = ((gx2 - gx1) * (gy2 - gy1)) * jnp.ones_like(max_dist)  # (P, K)
    areas = jnp.where(inside_gt & inside_range & gt_valid[None, :], areas, INF)

    min_area = jnp.min(areas, axis=1)                              # (P,)
    min_idx = jnp.argmin(areas, axis=1)
    labels = jnp.where(min_area < INF, gt_labels[min_idx], num_classes)
    tgt = jnp.take_along_axis(
        bbox_targets, min_idx[:, None, None].repeat(4, axis=-1), axis=1
    )[:, 0, :]                                                     # (P, 4)
    return labels.astype(jnp.int32), tgt


@partial(jax.jit, static_argnames=("num_classes", "center_sampling",
                                   "center_sample_radius", "norm_on_bbox"))
def fcos_targets(points: jnp.ndarray, regress_ranges: jnp.ndarray,
                 strides: jnp.ndarray, gt_bboxes: jnp.ndarray,
                 gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                 num_classes: int = 80, center_sampling: bool = True,
                 center_sample_radius: float = 1.5,
                 norm_on_bbox: bool = True):
    """Batched FCOS assignment.

    Args:
      points: (P, 2) all-level points (concatenated in level order)
      regress_ranges: (P, 2) per-point regress range
      strides: (P,) per-point stride
      gt_bboxes: (B, K, 4), gt_labels: (B, K), gt_valid: (B, K)

    Returns:
      labels: (B, P) int32 (num_classes = background)
      bbox_targets: (B, P, 4), divided by per-point stride when norm_on_bbox.
    """
    single = partial(_fcos_target_single, points, regress_ranges, strides,
                     num_classes=num_classes, center_sampling=center_sampling,
                     center_sample_radius=center_sample_radius)
    labels, tgt = jax.vmap(single)(gt_bboxes, gt_labels, gt_valid)
    if norm_on_bbox:
        tgt = tgt / strides[None, :, None]
    return labels, tgt


def expand_point_metadata(featmap_sizes: list[tuple[int, int]],
                          strides: list[int],
                          regress_ranges: list[tuple[float, float]]):
    """Build the per-point (P,) stride and (P, 2) regress-range arrays for a
    static set of feature map sizes (compile-time constants)."""
    import numpy as np

    stride_list, range_list = [], []
    for (h, w), s, rr in zip(featmap_sizes, strides, regress_ranges):
        n = h * w
        stride_list.append(np.full((n,), s, np.float32))
        range_list.append(np.tile(np.asarray(rr, np.float32), (n, 1)))
    return (jnp.asarray(np.concatenate(stride_list)),
            jnp.asarray(np.concatenate(range_list)))


def ignore_weight(labels: jnp.ndarray, ignore_labels: jnp.ndarray,
                  num_classes: int) -> jnp.ndarray:
    """Classification loss weight implementing DSL's ignore-region masking.

    Parity with ``fcos_head.py:297-304``: a point assigned to an ignore box
    (``ignore_labels != num_classes``) gets weight 0 — unless a *real* GT also
    claims it (``labels != num_classes``), in which case weight stays 1.
    """
    ignored = ignore_labels != num_classes
    real_fg = labels != num_classes
    return jnp.where(ignored & ~real_fg, 0.0, 1.0)
