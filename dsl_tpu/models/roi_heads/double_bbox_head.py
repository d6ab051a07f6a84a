"""Double-Head R-CNN bbox head: conv branch for regression, fc branch for
classification.

Parity with ``/root/reference/mmdet/models/roi_heads/bbox_heads/
double_bbox_head.py:9-177`` (BasicResBlock entry + Bottleneck conv stack →
avg-pool → class-specific reg; 2 FCs → cls) and ``double_roi_head.py:6-33``
(the regression branch reads RoI features extracted at 1.3x-scaled rois).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.models.layers import make_norm, normal_init


class BasicResBlock(nn.Module):
    """3x3 conv-bn + 1x1 conv-bn with a 1x1 identity projection
    (reference :10-73)."""

    out_channels: int
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(x.shape[-1], (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        y = nn.relu(make_norm(self.norm_cfg, name="bn1")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="conv2")(y)
        y = make_norm(self.norm_cfg, name="bn2")(y)
        ident = nn.Conv(self.out_channels, (1, 1), name="conv_identity")(x)
        ident = make_norm(self.norm_cfg, name="bn_identity")(ident)
        return nn.relu(y + ident)


class _Bottleneck(nn.Module):
    """Standard bottleneck (1-3-1) used in the conv branch."""

    channels: int
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        mid = self.channels // 4
        y = nn.Conv(mid, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(make_norm(self.norm_cfg, name="bn1")(y))
        y = nn.Conv(mid, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(make_norm(self.norm_cfg, name="bn2")(y))
        y = nn.Conv(self.channels, (1, 1), use_bias=False, name="conv3")(y)
        y = make_norm(self.norm_cfg, name="bn3")(y)
        return nn.relu(x + y)


@HEADS.register
class DoubleConvFCBBoxHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    roi_size: int = 7
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    reg_roi_scale_factor: float = 1.3
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    with_reg: bool = True

    @nn.compact
    def __call__(self, cls_feats, reg_feats):
        """cls_feats/reg_feats: (N, roi, roi, C) — the reg features come
        from ``reg_roi_scale_factor``-scaled rois."""
        n = cls_feats.shape[0]
        # conv branch -> reg
        x = BasicResBlock(self.conv_out_channels, name="res_block")(reg_feats)
        for i in range(self.num_convs):
            x = _Bottleneck(self.conv_out_channels, name=f"conv{i}")(x)
        x = jnp.mean(x, axis=(1, 2))                     # global avg pool
        reg = nn.Dense(self.num_classes * 4, kernel_init=normal_init(0.001),
                       name="fc_reg")(x)
        # fc branch -> cls
        y = cls_feats.reshape(n, -1)
        for i in range(self.num_fcs):
            y = nn.relu(nn.Dense(self.fc_out_channels, name=f"fc{i}")(y))
        cls = nn.Dense(self.num_classes + 1, kernel_init=normal_init(0.01),
                       name="fc_cls")(y)
        return cls, reg


def scale_rois(rois: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Scale boxes around their centers (mmcv ``roi_scale_factor``)."""
    cx = (rois[..., 0] + rois[..., 2]) * 0.5
    cy = (rois[..., 1] + rois[..., 3]) * 0.5
    w = (rois[..., 2] - rois[..., 0]) * factor
    h = (rois[..., 3] - rois[..., 1]) * factor
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)
