"""HTC heads: fused semantic head + mask head with info-flow residual.

Parity with ``/root/reference/mmdet/models/roi_heads/mask_heads/
fused_semantic_head.py:10-106`` (1x1 laterals fused at one FPN level, 4
convs, seg-logit + embedding outputs, CE loss x0.2) and
``htc_mask_head.py:1-38`` (FCN mask head that accepts the previous stage's
conv features through a 1x1 ``conv_res`` and also returns its own conv
features for the next stage — HTC's mask information flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.models.layers import normal_init


@HEADS.register
class FusedSemanticHead(nn.Module):
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183
    loss_weight: float = 0.2

    @nn.compact
    def __call__(self, feats):
        laterals = [nn.relu(nn.Conv(self.in_channels, (1, 1),
                                    name=f"lateral{i}")(f))
                    for i, f in enumerate(feats[:self.num_ins])]
        x = laterals[self.fusion_level]
        h, w = x.shape[1:3]
        for i, lat in enumerate(laterals):
            if i == self.fusion_level:
                continue
            x = x + jax.image.resize(lat, (lat.shape[0], h, w, lat.shape[3]),
                                     "bilinear")
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                name=f"conv{i}")(x))
        seg = nn.Conv(self.num_classes, (1, 1), name="conv_logits")(x)
        feat = nn.relu(nn.Conv(self.conv_out_channels, (1, 1),
                               name="conv_embedding")(x))
        return seg, feat


@HEADS.register
class HTCMaskHead(nn.Module):
    """FCN mask head with mask-info-flow residual input/output."""

    num_classes: int = 80
    in_channels: int = 256
    conv_out_channels: int = 256
    num_convs: int = 4
    roi_size: int = 14
    with_conv_res: bool = True

    @nn.compact
    def __call__(self, x, res_feat=None):
        if res_feat is not None and self.with_conv_res:
            res = nn.relu(nn.Conv(self.conv_out_channels, (1, 1),
                                  name="conv_res")(res_feat))
            x = x + res
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                name=f"conv{i}")(x))
        feat = x
        y = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                     strides=(2, 2), name="upsample")(x))
        logits = nn.Conv(self.num_classes, (1, 1),
                         kernel_init=normal_init(0.001),
                         name="conv_logits")(y)
        return logits, feat


def semantic_seg_loss(seg_logits, target, loss_weight: float = 0.2,
                      ignore_label: int = 255):
    """Semantic CE over the fused map (reference ``FusedSemanticHead.loss``
    :100-106)."""
    nc = seg_logits.shape[-1]
    valid = (target != ignore_label) & (target < nc)
    tgt = jnp.clip(target, 0, nc - 1)
    logp = jax.nn.log_softmax(seg_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return loss_weight * ce.sum() / jnp.maximum(
        valid.astype(jnp.float32).sum(), 1.0)
