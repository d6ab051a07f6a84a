"""HourglassNet backbone (CornerNet / CentripetalNet tier).

Parity with ``/root/reference/mmdet/models/backbones/hourglass.py:1-213``:
a 7x7/s2 + BasicBlock/s2 stem (stride 4), then ``num_stacks`` recursive
hourglass modules; between stacks the intermediate feature is the sum of a
1x1-projected skip and a 1x1-remapped head feature, passed through an
inter ResLayer. Returns one stride-4 feature per stack (2 for
Hourglass-104, 1 for Hourglass-52).

TPU notes: the recursion depth is static (config), so the whole net traces
to a single XLA program; nearest-neighbor upsampling via ``jnp.repeat``
(integral 2x — resolutions are powers of two under the stride-4 stem).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.backbones.resnet import BasicBlock
from dsl_tpu.models.layers import make_norm


class ResLayer(nn.Module):
    """Stack of BasicBlocks (reference ``mmdet/models/utils/res_layer.py``).

    ``downsample_first=False`` matches the reference's ``low3`` layer: the
    channel-changing block comes last.
    """

    planes: int
    num_blocks: int
    stride: int = 1
    downsample_first: bool = True
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            if self.downsample_first:
                stride = self.stride if i == 0 else 1
                planes = self.planes
            else:                       # channel change on the last block
                stride = self.stride if i == self.num_blocks - 1 else 1
                planes = (self.planes if i == self.num_blocks - 1
                          else x.shape[-1])
            x = BasicBlock(planes=planes, stride=stride,
                           norm_cfg=self.norm_cfg, name=f"block{i}")(x)
        return x


class HourglassModule(nn.Module):
    """One recursive hourglass (reference ``hourglass.py:11-92``)."""

    depth: int
    stage_channels: Sequence[int]
    stage_blocks: Sequence[int]
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        cur_block = self.stage_blocks[0]
        next_block = self.stage_blocks[1]
        cur_ch = self.stage_channels[0]
        next_ch = self.stage_channels[1]

        up1 = ResLayer(cur_ch, cur_block, norm_cfg=self.norm_cfg,
                       name="up1")(x)
        low1 = ResLayer(next_ch, cur_block, stride=2,
                        norm_cfg=self.norm_cfg, name="low1")(x)
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:],
                                   norm_cfg=self.norm_cfg,
                                   name="low2")(low1)
        else:
            low2 = ResLayer(next_ch, next_block, norm_cfg=self.norm_cfg,
                            name="low2")(low1)
        low3 = ResLayer(cur_ch, cur_block, downsample_first=False,
                        norm_cfg=self.norm_cfg, name="low3")(low2)
        # nearest 2x upsample back to up1's resolution
        up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
        up2 = up2[:, :up1.shape[1], :up1.shape[2]]
        return up1 + up2


@BACKBONES.register
class HourglassNet(nn.Module):
    """Stacked hourglass (reference ``hourglass.py:95-213``)."""

    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        cur_ch = self.stage_channels[0]
        # stem: 7x7/s2 conv-bn-relu + BasicBlock(128->256, s2)
        y = nn.Conv(128, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="stem_conv")(x)
        y = nn.relu(make_norm(self.norm_cfg, name="stem_bn")(y))
        inter = BasicBlock(planes=cur_ch, stride=2, norm_cfg=self.norm_cfg,
                           name="stem_block")(y)

        out_feats = []
        for ind in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, self.stage_channels,
                                 self.stage_blocks, norm_cfg=self.norm_cfg,
                                 name=f"hg{ind}")(inter)
            out = nn.Conv(self.feat_channel, (3, 3), padding=1,
                          use_bias=False, name=f"out_conv{ind}")(hg)
            out = nn.relu(make_norm(self.norm_cfg,
                                    name=f"out_bn{ind}")(out))
            out_feats.append(out)
            if ind < self.num_stacks - 1:
                skip = nn.Conv(cur_ch, (1, 1), use_bias=False,
                               name=f"conv1x1_{ind}")(inter)
                skip = make_norm(self.norm_cfg,
                                 name=f"conv1x1_bn{ind}")(skip)
                remap = nn.Conv(cur_ch, (1, 1), use_bias=False,
                                name=f"remap_conv{ind}")(out)
                remap = make_norm(self.norm_cfg,
                                  name=f"remap_bn{ind}")(remap)
                inter = ResLayer(cur_ch, 1, norm_cfg=self.norm_cfg,
                                 name=f"inter{ind}")(nn.relu(skip + remap))
        return tuple(out_feats)
