"""Bucketing bbox coder for Side-Aware Boundary Localization (SABL).

Parity with ``/root/reference/mmdet/core/bbox/coder/bucketing_bbox_coder.py:
11-350``: each proposal side is divided into ``num_buckets/2`` buckets on a
``scale_factor``-rescaled proposal; training targets are (a) one-hot bucket
labels for the nearest bucket per side with neighbor-ignore weights and
(b) fine offsets (in bucket units) for the ``offset_topk`` nearest buckets;
decode picks the argmax bucket per side, applies its offset, and rescores
with the top-2 bucket confidence (bucketing-guided rescoring).

All functions are dense/batched (inputs (N, 4)) and jit-safe — the
reference's python scatter loop over ``offset_topk`` becomes one-hot sums.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def bbox_rescale(bboxes: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Rescale boxes around their centers (reference
    ``core/bbox/transforms.py::bbox_rescale``)."""
    cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    w = (bboxes[..., 2] - bboxes[..., 0]) * scale_factor
    h = (bboxes[..., 3] - bboxes[..., 1]) * scale_factor
    return jnp.stack([cx - w * 0.5, cy - h * 0.5,
                      cx + w * 0.5, cy + h * 0.5], axis=-1)


def _buckets(proposals, num_buckets: int, scale_factor: float):
    """(reference ``generat_buckets`` :95-140) returns bucket sizes and the
    per-side bucket center coordinates, each (N, side_num)."""
    side_num = int(math.ceil(num_buckets / 2.0))
    p = bbox_rescale(proposals, scale_factor)
    pw = p[..., 2] - p[..., 0]
    ph = p[..., 3] - p[..., 1]
    bucket_w = pw / num_buckets
    bucket_h = ph / num_buckets
    steps = 0.5 + jnp.arange(side_num, dtype=jnp.float32)
    l_buckets = p[..., 0:1] + steps[None, :] * bucket_w[..., None]
    r_buckets = p[..., 2:3] - steps[None, :] * bucket_w[..., None]
    t_buckets = p[..., 1:2] + steps[None, :] * bucket_h[..., None]
    d_buckets = p[..., 3:4] - steps[None, :] * bucket_h[..., None]
    return bucket_w, bucket_h, l_buckets, r_buckets, t_buckets, d_buckets


def bbox2bucket(proposals, gt, num_buckets: int, scale_factor: float,
                offset_topk: int = 2, offset_upperbound: float = 1.0,
                cls_ignore_neighbor: bool = True):
    """(reference ``bbox2bucket`` :144-264) → (offsets, offset_weights,
    bucket_labels, cls_weights), each (N, 4*side_num), side order
    [l, r, t, d]."""
    side_num = int(math.ceil(num_buckets / 2.0))
    bucket_w, bucket_h, lb, rb, tb, db = _buckets(proposals, num_buckets,
                                                  scale_factor)
    eps = 1e-6
    bw = jnp.maximum(bucket_w, eps)[..., None]
    bh = jnp.maximum(bucket_h, eps)[..., None]
    offs = [(lb - gt[..., 0:1]) / bw, (rb - gt[..., 2:3]) / bw,
            (tb - gt[..., 1:2]) / bh, (db - gt[..., 3:4]) / bh]

    weights, labels, cls_ws = [], [], []
    for off in offs:
        topk_vals, topk_idx = jax.lax.top_k(-jnp.abs(off), offset_topk)
        topk_vals = -topk_vals                              # ascending |off|
        w = jax.nn.one_hot(topk_idx[..., 0], side_num)
        for k in range(1, offset_topk):
            w = w + jax.nn.one_hot(topk_idx[..., k], side_num) * (
                topk_vals[..., k] < offset_upperbound)[..., None]
        weights.append(w)
        lab = jax.nn.one_hot(topk_idx[..., 0], side_num)
        labels.append(lab)
        cw = (jnp.abs(off) < 1).astype(jnp.float32)
        if cls_ignore_neighbor:
            cw = 1.0 - ((cw == 1) & (lab == 0)).astype(jnp.float32)
        else:
            cw = jnp.ones_like(cw)
        cls_ws.append(cw)

    offsets = jnp.concatenate(offs, axis=-1)
    offset_weights = jnp.concatenate(weights, axis=-1)
    bucket_labels = jnp.concatenate(labels, axis=-1)
    cls_weights = jnp.concatenate(cls_ws, axis=-1)
    return offsets, offset_weights, bucket_labels, cls_weights


def bucket2bbox(proposals, cls_preds, offset_preds, num_buckets: int,
                scale_factor: float = 1.0, max_shape=None):
    """(reference ``bucket2bbox`` :267-350) → (boxes (N, 4),
    loc_confidence (N,)). ``cls_preds``/``offset_preds`` are
    (N, 4*side_num) in [l, r, t, d] side order."""
    side_num = int(math.ceil(num_buckets / 2.0))
    n = proposals.shape[0]
    scores = jax.nn.softmax(cls_preds.reshape(n, 4, side_num), axis=-1)
    top2, top2_idx = jax.lax.top_k(scores, 2)               # (N, 4, 2)
    best = top2_idx[..., 0]                                 # (N, 4)

    p = bbox_rescale(proposals, scale_factor)
    bucket_w = (p[..., 2] - p[..., 0]) / num_buckets
    bucket_h = (p[..., 3] - p[..., 1]) / num_buckets
    bf = best.astype(jnp.float32) + 0.5
    l_b = p[..., 0] + bf[:, 0] * bucket_w
    r_b = p[..., 2] - bf[:, 1] * bucket_w
    t_b = p[..., 1] + bf[:, 2] * bucket_h
    d_b = p[..., 3] - bf[:, 3] * bucket_h

    offs = offset_preds.reshape(n, 4, side_num)
    sel = jnp.take_along_axis(offs, best[..., None], axis=-1)[..., 0]  # (N,4)
    x1 = l_b - sel[:, 0] * bucket_w
    x2 = r_b - sel[:, 1] * bucket_w
    y1 = t_b - sel[:, 2] * bucket_h
    y2 = d_b - sel[:, 3] * bucket_h
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    conf = top2[..., 0] + top2[..., 1] * (
        jnp.abs(top2_idx[..., 0] - top2_idx[..., 1]) == 1)
    return boxes, conf.mean(axis=-1)
