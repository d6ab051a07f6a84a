"""ChannelMapper neck (reference ``mmdet/models/necks/channel_mapper.py``):
1x1(+GN) conv per input level to a common channel count, plus stride-2 3x3
extra convs on the last input when ``num_outs`` exceeds the inputs —
the Deformable-DETR input adapter."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from dsl_tpu.registry import MODELS


@MODELS.register
class ChannelMapper(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    kernel_size: int = 1
    num_outs: int | None = None

    @nn.compact
    def __call__(self, feats):
        feats = list(feats)[-len(self.in_channels):]
        outs = []
        for i, f in enumerate(feats):
            pad = self.kernel_size // 2
            y = nn.Conv(self.out_channels,
                        (self.kernel_size, self.kernel_size), padding=pad,
                        use_bias=False, name=f"conv{i}")(f)
            y = nn.GroupNorm(num_groups=32, name=f"gn{i}")(y)
            outs.append(nn.relu(y))
        num_outs = self.num_outs or len(outs)
        x = feats[-1]
        for i in range(num_outs - len(feats)):
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=1, use_bias=False, name=f"extra{i}")(x)
            x = nn.relu(nn.GroupNorm(num_groups=32, name=f"extra_gn{i}")(x))
            outs.append(x)
        return tuple(outs)


from dsl_tpu.registry import NECKS as _NECKS


@_NECKS.register
class IdentityNeck(nn.Module):
    """Passthrough neck for C4-style detectors (the reference simply has
    ``neck=None`` there, ``two_stage.py:35-38``)."""

    @nn.compact
    def __call__(self, feats):
        return tuple(feats)


@_NECKS.register
class SequentialNeck(nn.Module):
    """Compose necks in sequence (the reference expresses Libra R-CNN as
    ``neck=[FPN, BFP]`` — ``configs/libra_rcnn``)."""

    necks: tuple

    @nn.compact
    def __call__(self, feats):
        for neck in self.necks:
            feats = neck(feats)
        return feats
