"""MaskIoU head (Mask Scoring R-CNN).

Parity with ``/root/reference/mmdet/models/roi_heads/mask_heads/
maskiou_head.py`` + ``detectors/mask_scoring_rcnn.py``: a small conv+fc
head consumes the mask RoI features concatenated with the (max-pooled)
predicted mask and regresses the IoU between the predicted and GT mask;
at test time the detection score is multiplied by the predicted mask IoU.

Deviation (documented): the reference's ``area_ratios`` term uses the full
image-space GT mask area; with box-normalized GT crops (our device-side
target layout) the ratio is ≈1 and is omitted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.models.layers import normal_init


@HEADS.register
class MaskIoUHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    conv_out_channels: int = 256
    num_convs: int = 4
    fc_out_channels: int = 1024

    @nn.compact
    def __call__(self, mask_feats, mask_pred):
        """mask_feats (N, S, S, C); mask_pred (N, 2S, 2S) sigmoid probs of
        the predicted class. Returns (N, num_classes) mask-IoU scores."""
        pooled = nn.max_pool(mask_pred[..., None], (2, 2), strides=(2, 2))
        x = jnp.concatenate([mask_feats, pooled], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                strides=(stride, stride), padding=1,
                                kernel_init=normal_init(0.01),
                                name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(2):
            x = nn.relu(nn.Dense(self.fc_out_channels, name=f"fc{i}")(x))
        return nn.Dense(self.num_classes, kernel_init=normal_init(0.01),
                        name="fc_mask_iou")(x)


def mask_iou_target(mask_pred, mask_targets, pos_weight):
    """IoU between the binarized predicted mask and the GT target per roi
    (reference ``get_targets``, area-ratio term omitted — see module doc)."""
    pred_bin = (mask_pred >= 0.5).astype(jnp.float32)
    inter = (pred_bin * mask_targets).sum(axis=(1, 2))
    union = pred_bin.sum(axis=(1, 2)) + mask_targets.sum(axis=(1, 2)) - inter
    return jax.lax.stop_gradient(
        jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
        * pos_weight)


def mask_iou_loss(iou_pred, labels, iou_target, pos_weight,
                  num_classes: int, loss_weight: float = 0.5):
    """MSE on the assigned class's predicted IoU, positives only."""
    cls = jnp.clip(labels, 0, num_classes - 1)
    p = jnp.take_along_axis(iou_pred, cls[:, None], axis=1)[:, 0]
    num = jnp.maximum(pos_weight.sum(), 1.0)
    return loss_weight * ((p - iou_target) ** 2 * pos_weight).sum() / num
