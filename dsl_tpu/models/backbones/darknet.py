"""Darknet-53 backbone (YOLOv3 tier).

Parity with ``/root/reference/mmdet/models/backbones/darknet.py``: 3x3 stem,
five stride-2 stages with (1, 2, 8, 8, 4) residual blocks of
1x1-squeeze → 3x3-expand convs, LeakyReLU(0.1), BN; outputs stages (3, 4, 5).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.layers import make_norm


def _conv_block(x, features, kernel, stride, norm_cfg, name):
    pad = (kernel - 1) // 2
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=((pad, pad), (pad, pad)), use_bias=False,
                kernel_init=nn.initializers.he_normal(),
                name=f"{name}_conv")(x)
    x = make_norm(norm_cfg, name=f"{name}_bn")(x)
    return nn.leaky_relu(x, 0.1)


class DarkBlock(nn.Module):
    channels: int
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        out = _conv_block(x, self.channels // 2, 1, 1, self.norm_cfg, "conv1")
        out = _conv_block(out, self.channels, 3, 1, self.norm_cfg, "conv2")
        return x + out


@BACKBONES.register(name="Darknet")
class Darknet(nn.Module):
    depth: int = 53
    out_indices: Sequence[int] = (3, 4, 5)
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: dict | None = None
    pretrained: str | None = None

    @nn.compact
    def __call__(self, x):
        assert self.depth == 53, "only Darknet-53 is defined"
        blocks = (1, 2, 8, 8, 4)
        channels = (64, 128, 256, 512, 1024)
        x = _conv_block(x, 32, 3, 1, self.norm_cfg, "stem")
        outs = []
        for si, (n, c) in enumerate(zip(blocks, channels)):
            x = _conv_block(x, c, 3, 2, self.norm_cfg, f"down{si + 1}")
            for bi in range(n):
                x = DarkBlock(channels=c, norm_cfg=self.norm_cfg,
                              name=f"stage{si + 1}_{bi}")(x)
            if (si + 1) in self.out_indices:
                outs.append(x)
        return tuple(outs)
