"""SSD-VGG16 backbone.

Parity with ``/root/reference/mmdet/models/backbones/ssd_vgg.py:1-170``:
VGG-16 conv stack (pool5 is 3x3/s1), fc6/fc7 as dilated conv6 (3x3 d6,
1024ch) + conv7 (1x1, 1024ch), extra SSD layers alternating 1x1/3x3(s2),
and an L2Norm (learnable per-channel scale, init 20) on the conv4_3 output.
Outputs: conv4_3 (stride 8) + conv7 + each second extra layer.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES

VGG16_CFG = (2, 2, 3, 3, 3)     # convs per stage


class L2Norm(nn.Module):
    scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        g = self.param("weight",
                       nn.initializers.constant(self.scale),
                       (x.shape[-1],))
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)
        return x / n * g


@BACKBONES.register
class SSDVGG(nn.Module):
    input_size: int = 300
    depth: int = 16
    out_feature_indices: Sequence[int] = (22, 34)    # config parity
    extra_channels: Sequence[int] = (256, 512, 128, 256, 128, 256, 128, 256)

    @nn.compact
    def __call__(self, x, training: bool = False):
        if tuple(self.out_feature_indices) != (22, 34):
            # the tap points below are hardwired to conv4_3/fc7 (the only
            # values any reference config uses) — reject other indices
            raise NotImplementedError(
                "SSDVGG taps conv4_3+fc7 (out_feature_indices=(22, 34))")
        outs = []
        ch = 64
        for stage, n in enumerate(VGG16_CFG):
            for i in range(n):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=1,
                                    name=f"conv{stage + 1}_{i + 1}")(x))
            if stage == 3:
                outs.append(L2Norm(name="l2_norm")(x))   # conv4_3
            if stage < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:                                        # pool5: 3x3/s1
                x = nn.max_pool(x, (3, 3), strides=(1, 1),
                                padding=((1, 1), (1, 1)))
            if stage < 3:
                ch = min(ch * 2, 512)
        # fc6/fc7 as convs (:98-108)
        x = nn.relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=6,
                            name="conv6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), name="conv7")(x))
        outs.append(x)
        # extra layers: pairs of (1x1, kxk/s) (:120-146). SSD300: 4 pairs,
        # strides (2,2,1,1); SSD512: 5 pairs, strides (2,2,2,2,1) with a
        # final 4x4 kernel (reference configs/ssd/ssd512_coco.py neck:
        # level_strides/paddings + last_kernel_size=4).
        ec = self.extra_channels
        if self.input_size == 512:
            if len(ec) == 8:
                ec = tuple(ec) + (128, 256)
            strides, pads, kernels = \
                (2, 2, 2, 2, 1), (1, 1, 1, 1, 1), (3, 3, 3, 3, 4)
        else:
            strides, pads, kernels = (2, 2, 1, 1), (1, 1, 0, 0), (3, 3, 3, 3)
        for p, i in enumerate(range(0, len(ec), 2)):
            x = nn.relu(nn.Conv(ec[i], (1, 1), name=f"extra{i}")(x))
            k = kernels[p]
            x = nn.relu(nn.Conv(ec[i + 1], (k, k),
                                strides=(strides[p], strides[p]),
                                padding=pads[p], name=f"extra{i + 1}")(x))
            outs.append(x)
        return tuple(outs)
