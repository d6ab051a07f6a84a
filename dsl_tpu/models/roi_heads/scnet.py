"""SCNet heads: sample-consistency cascade components.

Parity with ``/root/reference/mmdet/models/roi_heads/scnet_roi_head.py:1-589``
and its sub-heads: SCNetBBoxHead (``scnet_bbox_head.py`` — Shared2FC that
also returns the shared fc feature), FeatureRelayHead
(``feature_relay_head.py:8-52`` — fc feature -> (roi, roi, C) map, 2x
upsampled, added to the mask roi features), GlobalContextHead
(``global_context_head.py:10-100`` — convs + GAP -> multilabel class
logits, BCE against per-image class presence; the pooled feature vector is
added to every roi's features), SCNetMaskHead / SCNetSemanticHead
(``scnet_mask_head.py`` / ``scnet_semantic_head.py`` — FCN/fused-semantic
stacks with the convs grouped into SimplifiedBasicBlocks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.models.layers import make_norm, normal_init


class SimplifiedBasicBlock(nn.Module):
    """Two 3x3 convs + skip, no final relu on the residual add
    (reference ``models/utils/res_layer.py`` SimplifiedBasicBlock)."""

    channels: int
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        y = nn.relu(make_norm(self.norm_cfg, name="bn1")(y))
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = make_norm(self.norm_cfg, name="bn2")(y)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), use_bias=False,
                        name="shortcut")(x)
        return nn.relu(x + y)


@HEADS.register
class SCNetBBoxHead(nn.Module):
    """Shared2FC bbox head that also returns the shared fc feature
    (relayed to the mask branch)."""

    num_classes: int = 80
    in_channels: int = 256
    roi_size: int = 7
    fc_channels: int = 1024
    target_means: tuple = (0.0, 0.0, 0.0, 0.0)
    target_stds: tuple = (0.1, 0.1, 0.2, 0.2)

    @nn.compact
    def __call__(self, roi_feats, return_shared_feat: bool = False):
        n = roi_feats.shape[0]
        x = roi_feats.reshape(n, -1)
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1, kernel_init=normal_init(0.01),
                       name="fc_cls")(x)
        reg = nn.Dense(self.num_classes * 4, kernel_init=normal_init(0.001),
                       name="fc_reg")(x)
        if return_shared_feat:
            return cls, reg, x
        return cls, reg


@HEADS.register
class FeatureRelayHead(nn.Module):
    in_channels: int = 1024
    out_conv_channels: int = 256
    roi_feat_size: int = 7
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        s = self.roi_feat_size
        c = self.out_conv_channels
        y = nn.Dense(s * s * c, name="fc")(x).reshape(n, s, s, c)
        out = s * self.scale_factor
        return jax.image.resize(y, (n, out, out, c), "bilinear")


@HEADS.register
class GlobalContextHead(nn.Module):
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 80
    loss_weight: float = 1.0
    conv_to_res: bool = True
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, feats):
        """feats: FPN tuple (uses the last level). Returns
        (logits (B, C), pooled context (B, conv_out))."""
        x = feats[-1]
        if self.conv_to_res:
            for i in range(self.num_convs // 2):
                x = SimplifiedBasicBlock(self.conv_out_channels,
                                         norm_cfg=self.norm_cfg,
                                         name=f"res{i}")(x)
        else:
            for i in range(self.num_convs):
                x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                    padding=1, name=f"conv{i}")(x))
        pooled = x.mean(axis=(1, 2))                      # (B, C)
        logits = nn.Dense(self.num_classes, kernel_init=normal_init(0.01),
                          name="fc")(pooled)
        return logits, pooled


@HEADS.register
class SCNetMaskHead(nn.Module):
    """FCN mask head with conv_to_res blocks (``scnet_mask_head.py``)."""

    num_classes: int = 80
    in_channels: int = 256
    conv_out_channels: int = 256
    num_convs: int = 12
    roi_size: int = 14
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats
        for i in range(self.num_convs // 2):
            x = SimplifiedBasicBlock(self.conv_out_channels,
                                     norm_cfg=self.norm_cfg,
                                     name=f"res{i}")(x)
        x = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                     strides=(2, 2), name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=normal_init(0.001),
                       name="conv_logits")(x)


def global_context_loss(logits, gt_labels, gt_valid, num_classes: int,
                        loss_weight: float = 1.0):
    """Multilabel BCE against per-image class presence
    (reference ``global_context_head.py loss``)."""
    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, num_classes - 1),
                            num_classes)
    target = jnp.max(onehot * gt_valid[..., None], axis=1)   # (B, C)
    logp = jax.nn.log_sigmoid(logits)
    logq = jax.nn.log_sigmoid(-logits)
    bce = -(target * logp + (1 - target) * logq)
    return loss_weight * bce.mean()
