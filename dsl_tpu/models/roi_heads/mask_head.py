"""FCN mask head + device-side mask targets for the instance-seg tier.

Parity with ``/root/reference/mmdet/models/roi_heads/mask_heads/
fcn_mask_head.py:1-376`` (4×conv3x3 + 2× deconv upsample + 1×1 class-wise
mask logits; BCE on the assigned class's 28×28 target; test-time sigmoid of
the predicted class's channel) and ``mmdet/core/mask/mask_target.py`` (crop
the assigned GT mask to the proposal and resize to the RoI mask size).

TPU-first design: the reference computes mask targets on host per sampled
proposal each step (numpy crop + cv2 resize). Here the dataloader stores each
GT instance mask once, cropped to its own GT box and resized to a fixed
``(M, M)`` crop (the layout Google's TPU Mask R-CNN uses), and the target for
any proposal is a bilinear resample of that crop under jit — no host work in
the hot loop, fully static shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.ops.roi_align import roi_align
from dsl_tpu.models.layers import normal_init

GT_MASK_CROP_SIZE = 112   # per-GT normalized mask crop stored in the batch


@HEADS.register
class FCNMaskHead(nn.Module):
    """4 convs + deconv ×2 upsample + per-class 1×1 logits (NHWC)."""

    num_classes: int = 80
    in_channels: int = 256
    conv_out_channels: int = 256
    num_convs: int = 4
    roi_size: int = 14
    predictor_cfg: dict | None = None   # dict(type='NormedConv2d', ...) —
    # seesaw_loss *_normed_mask configs (``normed_predictor.py`` NormedConv2d)

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats (N, roi, roi, C) -> mask logits (N, 2*roi, 2*roi, NC)."""
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                name=f"conv{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                     strides=(2, 2), name="upsample")(x))
        pred = dict(self.predictor_cfg or {})
        if pred.get("type") == "NormedConv2d":
            from dsl_tpu.models.layers import NormedConv

            return NormedConv(self.num_classes, kernel_size=1,
                              tempearture=float(pred.get("tempearture", 20)),
                              name="conv_logits")(x)
        if pred and pred.get("type") != "Conv":
            raise ValueError(f"unsupported mask predictor_cfg: {pred}")
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=normal_init(0.001), name="conv_logits")(x)


def gt_mask_crop(mask_u8, bbox, crop_size: int = GT_MASK_CROP_SIZE):
    """Host helper: crop one GT bitmap mask to its box, resize to (M, M).

    Matches the geometry ``mask_targets_from_crops`` inverts on device."""
    import numpy as np
    import cv2

    h, w = mask_u8.shape[:2]
    x1, y1, x2, y2 = bbox
    x1 = int(np.clip(np.floor(x1), 0, w - 1))
    y1 = int(np.clip(np.floor(y1), 0, h - 1))
    x2 = int(np.clip(np.ceil(x2), x1 + 1, w))
    y2 = int(np.clip(np.ceil(y2), y1 + 1, h))
    crop = mask_u8[y1:y2, x1:x2].astype(np.float32)
    return cv2.resize(crop, (crop_size, crop_size),
                      interpolation=cv2.INTER_LINEAR)


def mask_targets_from_crops(mask_crops, gt_bboxes, rois, batch_idx,
                            assigned_gt, mask_size: int = 28):
    """Device mask targets: resample each roi's window from its assigned GT's
    normalized mask crop (reference ``mask_target``: crop GT mask to proposal
    + resize — here the GT mask lives as a per-GT ``(M, M)`` crop).

    Args:
      mask_crops: (B, K, M, M) float in [0, 1]
      gt_bboxes:  (B, K, 4) xyxy in input-image coords
      rois:       (N, 4) sampled proposal boxes (input-image coords)
      batch_idx:  (N,) image index per roi
      assigned_gt:(N,) assigned GT index per roi (clipped to >= 0 upstream)
    Returns (N, mask_size, mask_size) float32 binarized {0, 1}.
    """
    b, k, m, _ = mask_crops.shape
    crops_flat = mask_crops.reshape(b * k, m, m, 1).astype(jnp.float32)
    # 1px zero ring: rois can extend past the GT box, where the target is 0 —
    # without it the bilinear edge-clamp would smear border values outward
    crops_flat = jnp.pad(crops_flat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gi = jnp.clip(assigned_gt, 0, k - 1)
    crop_idx = batch_idx * k + gi
    gt = gt_bboxes.reshape(b * k, 4)[crop_idx]                   # (N, 4)
    gw = jnp.maximum(gt[:, 2] - gt[:, 0], 1.0)
    gh = jnp.maximum(gt[:, 3] - gt[:, 1], 1.0)
    # proposal box in (padded) crop pixel coords; sampling clamps far-outside
    # points into the zero ring, which is the correct target there
    big = 4.0 * m
    cx1 = jnp.clip((rois[:, 0] - gt[:, 0]) * (m / gw), -big, big) + 1.0
    cy1 = jnp.clip((rois[:, 1] - gt[:, 1]) * (m / gh), -big, big) + 1.0
    cx2 = jnp.clip((rois[:, 2] - gt[:, 0]) * (m / gw), -big, big) + 1.0
    cy2 = jnp.clip((rois[:, 3] - gt[:, 1]) * (m / gh), -big, big) + 1.0
    flat_rois = jnp.stack(
        [crop_idx.astype(jnp.float32), cx1, cy1, cx2, cy2], axis=1)
    sampled = roi_align(crops_flat, flat_rois,
                        out_size=(mask_size, mask_size), spatial_scale=1.0,
                        sampling_ratio=2)[..., 0]
    return (sampled >= 0.5).astype(jnp.float32)


def mask_head_loss(mask_logits, targets, labels, pos_weight,
                   num_classes: int):
    """Per-class BCE over positive rois (reference FCNMaskHead.loss: CE with
    ``use_mask=True`` — only the assigned class's channel contributes).

    Args:
      mask_logits: (N, S, S, C); targets: (N, S, S) in {0, 1}
      labels: (N,) assigned class per roi; pos_weight: (N,) 1.0 on positives
    """
    n, s = mask_logits.shape[0], mask_logits.shape[1]
    cls = jnp.clip(labels, 0, num_classes - 1)
    logit = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None], axis=-1)[..., 0]  # (N, S, S)
    per_px = (jnp.maximum(logit, 0) - logit * targets
              + jnp.log1p(jnp.exp(-jnp.abs(logit))))
    num_pos = jnp.maximum(jnp.sum(pos_weight), 1.0)
    return jnp.sum(jnp.mean(per_px, axis=(1, 2)) * pos_weight) / num_pos


def select_positive_rois(rois, labels, assigned, is_pos, max_pos: int):
    """Per-image fixed-capacity positive-roi selection (static shapes).

    rois (B, S, 4) ... -> each (B, max_pos, ...) + validity (B, max_pos)."""
    def one(r, l, a, p):
        order = jnp.argsort(~p)[:max_pos]      # stable: positives first
        return (r[order], l[order], a[order], p[order])

    return jax.vmap(one)(rois, labels, assigned, is_pos)


def paste_masks(mask_probs, boxes, img_h: int, img_w: int,
                thr: float = 0.5):
    """Host: paste (N, S, S) mask probabilities into full-image binary masks
    at their (original-coordinate) boxes (reference
    ``fcn_mask_head.py get_seg_masks``)."""
    import numpy as np
    import cv2

    n = len(mask_probs)
    out = np.zeros((n, img_h, img_w), np.uint8)
    for i in range(n):
        x1, y1, x2, y2 = boxes[i][:4]
        x1 = int(np.clip(np.floor(x1), 0, img_w - 1))
        y1 = int(np.clip(np.floor(y1), 0, img_h - 1))
        x2 = int(np.clip(np.ceil(x2), x1 + 1, img_w))
        y2 = int(np.clip(np.ceil(y2), y1 + 1, img_h))
        m = cv2.resize(np.asarray(mask_probs[i], np.float32),
                       (x2 - x1, y2 - y1), interpolation=cv2.INTER_LINEAR)
        out[i, y1:y2, x1:x2] = (m >= thr).astype(np.uint8)
    return out
