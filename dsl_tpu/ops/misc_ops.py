"""Misc native-op replacements: CornerPool, CARAFE, nms_match, point_sample.

TPU-native equivalents of the remaining mmcv CUDA ops in SURVEY.md §2.2:

- Corner pooling (CornerNet): directional running max — ``lax.cummax``
  along the spatial axis (the CUDA kernel is a sequential scan; the TPU
  gets a log-depth scan for free).
- CARAFE (content-aware reassembly): kernel-prediction upsampling — the
  k×k neighborhood gather + per-pixel predicted-kernel contraction.
- nms_match: greedy NMS grouping on host (used by some zoo heads offline).
- point_sample: bilinear sampling at normalized points (PointRend tier).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def corner_pool(x: jnp.ndarray, direction: str) -> jnp.ndarray:
    """Directional corner pooling on NHWC maps.

    direction: 'top' (max over rows below), 'bottom', 'left', 'right' —
    mmcv CornerPool semantics."""
    if direction == "top":        # each row sees the max of itself..bottom
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 1), axis=1), 1)
    if direction == "bottom":
        return jax.lax.cummax(x, axis=1)
    if direction == "left":
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 2), axis=2), 2)
    if direction == "right":
        return jax.lax.cummax(x, axis=2)
    raise ValueError(direction)


def carafe(x: jnp.ndarray, masks: jnp.ndarray, kernel_size: int = 5,
           scale: int = 2) -> jnp.ndarray:
    """CARAFE reassembly (``mmcv.ops.carafe`` semantics).

    Args:
      x: (B, H, W, C) features.
      masks: (B, H*scale, W*scale, k²) softmax-normalized predicted kernels.
    Returns (B, H*scale, W*scale, C).
    """
    b, h, w, c = x.shape
    k = kernel_size
    pad = k // 2
    oh, ow = h * scale, w * scale
    ys = jnp.arange(oh) // scale                     # source row per out row
    xs = jnp.arange(ow) // scale
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = jnp.zeros((b, oh, ow, c), x.dtype)
    t = 0
    for dy in range(k):
        for dx in range(k):
            patch = xp[:, ys + dy][:, :, xs + dx]    # (B, oh, ow, C)
            out = out + patch * masks[..., t:t + 1]
            t += 1
    return out


def nms_match(boxes: jnp.ndarray, scores, iou_threshold: float):
    """Greedy NMS grouping: list of index arrays, first = kept box
    (mmcv ``nms_match``). Host-side numpy."""
    import numpy as np

    boxes = np.asarray(boxes)
    scores = np.asarray(scores)
    order = np.argsort(-scores, kind="mergesort")
    groups = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        members = [i]
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-10)
        for j in order:
            if j != i and not suppressed[j] and iou[j] >= iou_threshold:
                suppressed[j] = True
                members.append(j)
        suppressed[i] = True
        groups.append(np.asarray(members, np.int64))
    return groups


def point_sample(feats: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample NHWC features at normalized [0, 1] points
    (mmcv ``point_sample`` without the corner align): feats (B, H, W, C),
    points (B, P, 2) as (x, y) → (B, P, C)."""
    b, h, w, c = feats.shape
    xs = points[..., 0] * w - 0.5
    ys = points[..., 1] * h - 0.5
    from dsl_tpu.ops.deform_conv import _bilinear_map

    # reuse the masked bilinear: reshape points to a (B, P, 1) pseudo-image
    out = _bilinear_map(feats, ys[..., None], xs[..., None])
    return out[:, :, 0, :]
