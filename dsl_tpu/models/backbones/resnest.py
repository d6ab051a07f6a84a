"""ResNeSt backbone (split-attention networks).

Parity with ``/root/reference/mmdet/models/backbones/resnest.py:1-317``:
bottlenecks whose 3x3 conv is a radix-``r`` Split-Attention conv (grouped
conv producing radix splits, global-pooled gating with r-softmax across the
radix), deep stem (3x 3x3) with avg-pool downsampling (``avg_down=True``)
and AvgPool-before-conv inside strided blocks (``avd=True``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.layers import make_norm

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class SplitAttentionConv(nn.Module):
    """(reference ``SplitAttentionConv2d`` :40-150)."""

    channels: int
    stride: int = 1
    radix: int = 2
    groups: int = 1
    reduction_factor: int = 4
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        r = self.radix
        c = self.channels
        inter = max(x.shape[-1] * r // self.reduction_factor, 32)
        y = nn.Conv(c * r, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=self.groups * r,
                    use_bias=False, name="conv")(x)
        y = nn.relu(make_norm(self.norm_cfg, name="norm0")(y))
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = splits.sum(axis=3).mean(axis=(1, 2))          # (B, C)
        gap = nn.relu(make_norm(self.norm_cfg, name="norm1")(
            nn.Dense(inter, name="fc1")(gap)))
        att = nn.Dense(c * r, name="fc2")(gap).reshape(b, r, c)
        att = jax.nn.softmax(att, axis=1) if r > 1 else \
            jax.nn.sigmoid(att)
        return (splits * att[:, None, None, :, :]).sum(axis=3)


class SABottleneck(nn.Module):
    planes: int              # output channels = planes * 4
    stride: int = 1
    radix: int = 2
    groups: int = 1
    base_width: int = 4
    avd: bool = True
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        # width = planes when groups == 1, else floor(planes*bw/64)*groups
        # (reference :185-189)
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(make_norm(self.norm_cfg, name="bn1")(y))
        # avd: the SA conv runs at stride 1 and a 3x3 avg-pool applies the
        # stride after it (reference forward :245-248)
        sa_stride = 1 if (self.avd and self.stride > 1) else self.stride
        y = SplitAttentionConv(width, stride=sa_stride, radix=self.radix,
                               groups=self.groups, norm_cfg=self.norm_cfg,
                               name="conv2")(y)
        if self.avd and self.stride > 1:
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = make_norm(self.norm_cfg, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            # avg_down shortcut (:270-290)
            if self.stride != 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                               name="downsample_conv")(identity)
            identity = make_norm(self.norm_cfg,
                                 name="downsample_bn")(identity)
        return nn.relu(y + identity)


@BACKBONES.register
class ResNeSt(nn.Module):
    depth: int = 50
    radix: int = 2
    groups: int = 1
    base_width: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    stem_channels: int = 64
    norm_cfg: dict | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        blocks = ARCH[self.depth]
        # deep stem: 3x 3x3 convs (reference ResNetV1d stem)
        for i, (ch, s) in enumerate([(self.stem_channels // 2, 2),
                                     (self.stem_channels // 2, 1),
                                     (self.stem_channels, 1)]):
            x = nn.Conv(ch, (3, 3), strides=(s, s), padding=1,
                        use_bias=False, name=f"stem_conv{i}")(x)
            x = nn.relu(make_norm(self.norm_cfg, name=f"stem_bn{i}")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        for stage, n in enumerate(blocks):
            for blk in range(n):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = SABottleneck(planes=planes, stride=stride,
                                 radix=self.radix, groups=self.groups,
                                 base_width=self.base_width,
                                 norm_cfg=self.norm_cfg,
                                 name=f"layer{stage + 1}_{blk}")(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
