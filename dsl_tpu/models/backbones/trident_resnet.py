"""TridentResNet backbone.

Parity with ``/root/reference/mmdet/models/backbones/trident_resnet.py:
13-297``: a C4-style ResNet whose last stage is replaced by trident
bottlenecks — the 3x3 conv weight is SHARED across three parallel branches
run at dilations (1, 2, 3); the final block concatenates the branch outputs
along the batch axis (each branch sees the same images at a different
receptive field). ``test_branch_idx`` selects a single branch at inference.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.backbones.resnet import Bottleneck
from dsl_tpu.models.layers import make_norm

ARCH = {50: (3, 4, 6), 101: (3, 4, 23)}      # C4 backbones (num_stages=3)


class TridentBottleneck(nn.Module):
    """Weight-shared multi-dilation bottleneck (reference :93-220)."""

    planes: int
    stride: int = 1
    dilations: Sequence[int] = (1, 2, 3)
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, branches):
        """branches: list of (B, H, W, C) — one per dilation."""
        out_ch = self.planes * 4
        conv1 = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")
        bn1 = make_norm(self.norm_cfg, name="bn1")
        w2 = self.param("conv2_kernel", nn.initializers.he_normal(),
                        (3, 3, self.planes, self.planes))
        bn2 = make_norm(self.norm_cfg, name="bn2")
        conv3 = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")
        bn3 = make_norm(self.norm_cfg, name="bn3")
        need_down = self.stride != 1 or branches[0].shape[-1] != out_ch
        if need_down:
            dconv = nn.Conv(out_ch, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False, name="downsample_conv")
            dbn = make_norm(self.norm_cfg, name="downsample_bn")

        outs = []
        for x, d in zip(branches, self.dilations):
            y = nn.relu(bn1(conv1(x)))
            y = jax.lax.conv_general_dilated(
                y, w2, (self.stride, self.stride), ((d, d), (d, d)),
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(bn2(y))
            y = bn3(conv3(y))
            identity = dbn(dconv(x)) if need_down else x
            outs.append(nn.relu(y + identity))
        return outs


@BACKBONES.register
class TridentResNet(nn.Module):
    depth: int = 50
    num_branch: int = 3
    test_branch_idx: int = 1
    trident_dilations: Sequence[int] = (1, 2, 3)
    stem_channels: int = 64
    norm_cfg: dict | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        blocks = ARCH[self.depth]
        x = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, name="stem_conv")(x)
        x = nn.relu(make_norm(self.norm_cfg, name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = 64
        for stage, n in enumerate(blocks[:-1]):
            for blk in range(n):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = Bottleneck(planes=planes, stride=stride,
                               norm_cfg=self.norm_cfg,
                               name=f"layer{stage + 1}_{blk}")(x)
            planes *= 2
        # trident stage: branches share weights, differ in dilation
        branches = [x] * (self.num_branch if training
                          or self.test_branch_idx == -1 else 1)
        dils = (self.trident_dilations if len(branches) > 1
                else (self.trident_dilations[self.test_branch_idx],))
        for blk in range(blocks[-1]):
            stride = 2 if blk == 0 else 1
            branches = TridentBottleneck(
                planes=planes, stride=stride, dilations=dils,
                norm_cfg=self.norm_cfg,
                name=f"trident_{blk}")(branches)
        # concat branches along batch (reference last-block concat_output)
        return (jnp.concatenate(branches, axis=0),)
