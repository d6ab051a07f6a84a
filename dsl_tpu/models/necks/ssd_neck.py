"""SSDNeck — extra downsampling stages appended to a backbone's outputs.

Parity with ``/root/reference/mmdet/models/necks/ssd_neck.py:9-103``: the
input feature maps pass through unchanged (optionally the first one through
an L2Norm of init scale ``l2_norm_scale``); each extra level is a 1x1
(out//2) conv followed by a 3x3 stride-``level_strides[i]`` conv — a
depthwise-separable pair when ``use_depthwise`` (the SSDLite /
MobileNetV2 arrangement).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dsl_tpu.registry import NECKS
from dsl_tpu.models.layers import make_norm


@NECKS.register
class SSDNeck(nn.Module):
    in_channels: Sequence[int] = (96, 1280)
    out_channels: Sequence[int] = (96, 1280, 512, 256, 256, 128)
    level_strides: Sequence[int] = (2, 2, 2, 2)
    level_paddings: Sequence[int] = (1, 1, 1, 1)
    l2_norm_scale: float | None = None
    last_kernel_size: int = 3
    use_depthwise: bool = False
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, feats):
        feats = list(feats)
        assert len(self.out_channels) > len(self.in_channels)
        if self.l2_norm_scale:
            from dsl_tpu.models.backbones.ssd_vgg import L2Norm

            feats[0] = L2Norm(scale=self.l2_norm_scale,
                              name="l2_norm")(feats[0])

        extra_channels = self.out_channels[len(self.in_channels):]
        x = feats[-1]
        for i, (oc, stride, pad) in enumerate(
                zip(extra_channels, self.level_strides, self.level_paddings)):
            k = self.last_kernel_size \
                if i == len(extra_channels) - 1 else 3
            x = nn.Conv(oc // 2, (1, 1), use_bias=self.norm_cfg is None,
                        name=f"extra{i}_conv1")(x)
            if self.norm_cfg is not None:
                x = make_norm(self.norm_cfg, name=f"extra{i}_bn1")(x)
            x = nn.relu(x)
            if self.use_depthwise:
                c = x.shape[-1]
                x = nn.Conv(c, (k, k), strides=(stride, stride),
                            padding=((pad, pad), (pad, pad)),
                            feature_group_count=c, use_bias=False,
                            name=f"extra{i}_dw")(x)
                x = make_norm(self.norm_cfg or dict(type="BN"),
                              name=f"extra{i}_dwbn")(x)
                x = nn.relu(x)
                x = nn.Conv(oc, (1, 1), use_bias=self.norm_cfg is None,
                            name=f"extra{i}_pw")(x)
                if self.norm_cfg is not None:
                    x = make_norm(self.norm_cfg, name=f"extra{i}_pwbn")(x)
                x = nn.relu(x)
            else:
                x = nn.Conv(oc, (k, k), strides=(stride, stride),
                            padding=((pad, pad), (pad, pad)),
                            use_bias=self.norm_cfg is None,
                            name=f"extra{i}_conv2")(x)
                if self.norm_cfg is not None:
                    x = make_norm(self.norm_cfg, name=f"extra{i}_bn2")(x)
                x = nn.relu(x)
            feats.append(x)
        return tuple(feats)
