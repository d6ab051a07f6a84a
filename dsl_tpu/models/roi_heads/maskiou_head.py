"""MaskIoU head (Mask Scoring R-CNN).

Parity with ``/root/reference/mmdet/models/roi_heads/mask_heads/
maskiou_head.py`` + ``detectors/mask_scoring_rcnn.py``: a small conv+fc
head consumes the mask RoI features concatenated with the (max-pooled)
predicted mask and regresses the IoU between the predicted and GT mask;
at test time the detection score is multiplied by the predicted mask IoU.

The reference's ``area_ratios`` term (maskiou_head.py:97-170) scales the
28x28 in-proposal GT area up to the FULL instance area, so the regressed
IoU is against the whole instance even when the proposal cuts it.  Here the
full instance pixel area comes from the host (``gt_mask_areas`` in the
batch, exact) and the in-proposal GT area is integrated from the per-GT
normalized mask crop on device (``_gt_area_inside``); the legacy
crop-relative form (no area term) remains for callers without areas.
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


def _gt_area_inside(crops, gt_boxes, rois, img_shapes):
    """Pixel area of each roi's assigned GT mask inside the (int-cast,
    clipped) proposal, integrated from the per-GT normalized mask crop.

    Mirrors the reference's ``_get_area_ratio`` numerator
    (maskiou_head.py:147-170: ``gt_mask.crop(bbox.astype(int32)).areas``):
    the proposal is truncated to ints and clipped exactly like
    ``BitmapMasks.crop``, and the crop cell centers falling inside are
    summed with their image-pixel cell area.

    Args:
      crops:      (N, M, M) float/uint8 — assigned GT's normalized crop
      gt_boxes:   (N, 4) assigned GT boxes (input-image coords)
      rois:       (N, 4) proposal boxes
      img_shapes: (N, 2) [h, w] per roi (unpadded image shape)
    Returns (N,) float32 pixel areas.
    """
    m = crops.shape[-1]
    ih, iw = img_shapes[:, 0], img_shapes[:, 1]
    # the gt crop window: floor/ceil ints exactly as gt_mask_crop (host)
    gx1 = jnp.clip(jnp.floor(gt_boxes[:, 0]), 0, iw - 1)
    gy1 = jnp.clip(jnp.floor(gt_boxes[:, 1]), 0, ih - 1)
    gx2 = jnp.clip(jnp.ceil(gt_boxes[:, 2]), gx1 + 1, iw)
    gy2 = jnp.clip(jnp.ceil(gt_boxes[:, 3]), gy1 + 1, ih)
    # proposal window: int truncation + BitmapMasks.crop clip-to-[0, size]
    # (the numpy slice then clamps the far edge back inside the image)
    px1 = jnp.clip(jnp.trunc(rois[:, 0]), 0, iw)
    py1 = jnp.clip(jnp.trunc(rois[:, 1]), 0, ih)
    px2 = jnp.minimum(
        px1 + jnp.maximum(jnp.clip(jnp.trunc(rois[:, 2]), 0, iw) - px1, 1),
        iw)
    py2 = jnp.minimum(
        py1 + jnp.maximum(jnp.clip(jnp.trunc(rois[:, 3]), 0, ih) - py1, 1),
        ih)
    gw = gx2 - gx1
    gh = gy2 - gy1
    # crop cell centers in image coords, separable inside-indicators
    ax = gx1[:, None] + (jnp.arange(m) + 0.5)[None, :] * (gw[:, None] / m)
    ay = gy1[:, None] + (jnp.arange(m) + 0.5)[None, :] * (gh[:, None] / m)
    ux = ((ax >= px1[:, None]) & (ax < px2[:, None])).astype(jnp.float32)
    uy = ((ay >= py1[:, None]) & (ay < py2[:, None])).astype(jnp.float32)
    cell = (gw * gh) / (m * m)
    return jnp.einsum("nij,ni,nj->n", crops.astype(jnp.float32), uy,
                      ux) * cell


def mask_iou_target(mask_pred, mask_targets, pos_weight, gt_full_areas=None,
                    crops=None, gt_boxes=None, rois=None, img_shapes=None,
                    mask_thr_binary: float = 0.5):
    """Mask-IoU regression target per roi (reference ``get_targets``
    maskiou_head.py:96-145).

    With ``gt_full_areas`` (+ crops/gt_boxes/rois/img_shapes) the reference's
    area-ratio correction is applied: the 28x28 GT target area is scaled to
    the FULL instance area via the in-proposal/full pixel-area ratio, so the
    target is the IoU against the whole instance.  Without it, falls back to
    the crop-relative IoU (legacy form).
    """
    pred_bin = (mask_pred > mask_thr_binary).astype(jnp.float32)
    pred_area = pred_bin.sum(axis=(1, 2))
    inter = (pred_bin * mask_targets).sum(axis=(1, 2))
    if gt_full_areas is None:
        union = pred_area + mask_targets.sum(axis=(1, 2)) - inter
        return jax.lax.stop_gradient(
            jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
            * pos_weight)
    inside = _gt_area_inside(crops, gt_boxes, rois, img_shapes)
    ratio = inside / (gt_full_areas + 1e-7)
    gt_full = mask_targets.sum(axis=(1, 2)) / (ratio + 1e-7)
    denom = pred_area + gt_full - inter
    iou = jnp.where(denom > 0, inter / jnp.maximum(denom, 1e-7), 0.0)
    return jax.lax.stop_gradient(iou * pos_weight)


def mask_iou_loss(iou_pred, labels, iou_target, pos_weight,
                  num_classes: int, loss_weight: float = 0.5):
    """MSE on the assigned class's predicted IoU (reference ``loss``
    maskiou_head.py:87-94: only rois with ``target > 0`` contribute, mean
    over that set, MSELoss loss_weight=0.5)."""
    cls = jnp.clip(labels, 0, num_classes - 1)
    p = jnp.take_along_axis(iou_pred, cls[:, None], axis=1)[:, 0]
    sel = (iou_target > 0).astype(jnp.float32) * pos_weight
    num = jnp.maximum(sel.sum(), 1.0)
    return loss_weight * ((p - iou_target) ** 2 * sel).sum() / num
