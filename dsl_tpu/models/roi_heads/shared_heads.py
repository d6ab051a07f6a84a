"""C4-style shared head: res5 stage on RoI features + avg-pool bbox head.

Parity with ``/root/reference/mmdet/models/roi_heads/shared_heads/
res_layer.py`` (the res5 ``ResLayer`` applied per-roi, stride 2:
14x14x1024 -> 7x7x2048) and ``bbox_heads/bbox_head.py`` with
``with_avg_pool=True`` (global average pool then linear cls/reg) — the
classic Faster R-CNN C4 arrangement, also used by the reference's
TridentFasterRCNN (``trident_roi_head.py``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.models.backbones.resnet import Bottleneck
from dsl_tpu.models.layers import normal_init


@HEADS.register
class ResLayerSharedHead(nn.Module):
    """res5 on roi features (``shared_heads/res_layer.py:12-80``)."""

    depth: int = 50
    stage: int = 3
    stride: int = 2
    dilation: int = 1
    style: str = "pytorch"
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, roi_feats):
        stage_blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                        50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                        152: (3, 8, 36, 3)}[self.depth]
        n = stage_blocks[self.stage]
        planes = 64 * 2 ** self.stage
        x = roi_feats
        for i in range(n):
            x = Bottleneck(planes=planes,
                           stride=self.stride if i == 0 else 1,
                           dilation=self.dilation, style=self.style,
                           norm_cfg=self.norm_cfg, name=f"block{i}")(x)
        return x


@HEADS.register
class BBoxHeadAvgPool(nn.Module):
    """Plain BBoxHead with global average pooling
    (``bbox_heads/bbox_head.py`` ``with_avg_pool=True``, no shared FCs)."""

    num_classes: int = 80
    in_channels: int = 1024      # channels entering roi_forward (C4)
    roi_size: int = 14
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    with_reg: bool = True

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats.mean(axis=(1, 2))                  # (N, C)
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=normal_init(0.01), name="fc_cls")(x)
        if not self.with_reg:
            return cls, jnp.zeros((x.shape[0], self.num_classes * 4),
                                  cls.dtype)
        reg = nn.Dense(self.num_classes * 4,
                       kernel_init=normal_init(0.001), name="fc_reg")(x)
        return cls, reg
