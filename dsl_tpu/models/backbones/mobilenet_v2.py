"""MobileNetV2 backbone (lightweight tier).

Parity with ``/root/reference/mmdet/models/backbones/mobilenet_v2.py``:
inverted-residual blocks (expand 1x1 → depthwise 3x3 → project 1x1, skip on
matching stride/channels), ``out_indices`` over the 7 stages, width
multiplier, ``make_divisible`` channel rounding.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.layers import make_norm


def make_divisible(v: float, divisor: int = 8, min_value: int | None = None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.stride == 1 and in_ch == self.out_channels
        out = x
        if self.expand_ratio != 1:
            out = nn.Conv(hidden, (1, 1), padding="VALID", use_bias=False,
                          kernel_init=nn.initializers.he_normal(),
                          name="expand_conv")(out)
            out = make_norm(self.norm_cfg, name="expand_bn")(out)
            out = nn.relu6(out)
        out = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), feature_group_count=hidden,
                      use_bias=False,
                      kernel_init=nn.initializers.he_normal(),
                      name="depthwise_conv")(out)
        out = make_norm(self.norm_cfg, name="depthwise_bn")(out)
        out = nn.relu6(out)
        out = nn.Conv(self.out_channels, (1, 1), padding="VALID",
                      use_bias=False,
                      kernel_init=nn.initializers.he_normal(),
                      name="project_conv")(out)
        out = make_norm(self.norm_cfg, name="project_bn")(out)
        return x + out if use_res else out


# (expand_ratio, channels, num_blocks, stride) per stage
ARCH = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


@BACKBONES.register(name="MobileNetV2")
class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    out_indices: Sequence[int] = (1, 2, 4, 6)
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: dict | None = None
    pretrained: str | None = None

    @nn.compact
    def __call__(self, x):
        ch = make_divisible(32 * self.widen_factor)
        x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=nn.initializers.he_normal(),
                    name="conv1")(x)
        x = make_norm(self.norm_cfg, name="bn1")(x)
        x = nn.relu6(x)
        outs = []
        for si, (t, c, n, s) in enumerate(ARCH):
            out_ch = make_divisible(c * self.widen_factor)
            for bi in range(n):
                x = InvertedResidual(
                    out_channels=out_ch, stride=s if bi == 0 else 1,
                    expand_ratio=t, norm_cfg=self.norm_cfg,
                    name=f"layer{si + 1}_{bi}")(x)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)
