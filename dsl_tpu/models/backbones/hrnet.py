"""HRNet backbone (flax NHWC).

Parity with ``/root/reference/mmdet/models/backbones/hrnet.py:1-537``: stem
(2× stride-2 3x3), a Bottleneck stage-1, then multi-resolution stages of
BasicBlock branches with full fuse layers (upsample = 1x1 conv + nearest;
downsample = chains of stride-2 3x3 convs) and inter-stage transitions.
Configured by the mmdet ``extra`` dict (num_modules/num_branches/num_blocks/
num_channels per stage); returns all branch maps (multiscale_output), e.g.
HRNet-W18 → channels (18, 36, 72, 144) at strides (4, 8, 16, 32).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.layers import conv1x1, make_norm


def _conv3(ch, stride, name):
    return nn.Conv(ch, (3, 3), strides=(stride, stride), padding=1,
                   use_bias=False, kernel_init=nn.initializers.he_normal(),
                   name=name)


class _BasicBlock(nn.Module):
    planes: int
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv3(self.planes, 1, "conv1")(x)
        out = nn.relu(make_norm(self.norm_cfg, name="bn1")(out))
        out = _conv3(self.planes, 1, "conv2")(out)
        out = make_norm(self.norm_cfg, name="bn2")(out)
        if x.shape[-1] != self.planes:
            identity = conv1x1(self.planes, 1, name="downsample_conv")(x)
            identity = make_norm(self.norm_cfg,
                                 name="downsample_bn")(identity)
        return nn.relu(out + identity)


class _Bottleneck(nn.Module):
    planes: int
    norm_cfg: dict | None = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        identity = x
        out = conv1x1(self.planes, 1, name="conv1")(x)
        out = nn.relu(make_norm(self.norm_cfg, name="bn1")(out))
        out = _conv3(self.planes, 1, "conv2")(out)
        out = nn.relu(make_norm(self.norm_cfg, name="bn2")(out))
        out = conv1x1(out_ch, 1, name="conv3")(out)
        out = make_norm(self.norm_cfg, name="bn3")(out)
        if x.shape[-1] != out_ch:
            identity = conv1x1(out_ch, 1, name="downsample_conv")(x)
            identity = make_norm(self.norm_cfg,
                                 name="downsample_bn")(identity)
        return nn.relu(out + identity)


def _upsample_to(x, target_hw):
    th, tw = target_hw
    return jax.image.resize(x, (x.shape[0], th, tw, x.shape[-1]),
                            method="nearest")


class HRModule(nn.Module):
    """num_branches parallel BasicBlock chains + full fuse (hrnet.py
    HRModule)."""

    num_branches: int
    num_blocks: Sequence[int]
    channels: Sequence[int]
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, xs):
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            for k in range(self.num_blocks[b]):
                x = _BasicBlock(self.channels[b], self.norm_cfg,
                                name=f"branch{b}_block{k}")(x)
            outs.append(x)
        if self.num_branches == 1:
            return outs
        fused = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                y = outs[j]
                if j > i:       # upsample: 1x1 conv + bn + nearest
                    y = conv1x1(self.channels[i], 1,
                                name=f"fuse{i}_{j}_conv")(y)
                    y = make_norm(self.norm_cfg, name=f"fuse{i}_{j}_bn")(y)
                    y = _upsample_to(y, outs[i].shape[1:3])
                elif j < i:     # downsample chain of stride-2 3x3
                    for s in range(i - j):
                        ch = self.channels[i] if s == i - j - 1 \
                            else self.channels[j]
                        y = _conv3(ch, 2, f"fuse{i}_{j}_ds{s}_conv")(y)
                        y = make_norm(self.norm_cfg,
                                      name=f"fuse{i}_{j}_ds{s}_bn")(y)
                        if s != i - j - 1:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


DEFAULT_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(4,), num_channels=(64,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(4, 4), num_channels=(18, 36)),
    stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                num_blocks=(4, 4, 4), num_channels=(18, 36, 72)),
    stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                num_blocks=(4, 4, 4, 4), num_channels=(18, 36, 72, 144)),
)


@BACKBONES.register
class HRNet(nn.Module):
    extra: Any = None
    norm_cfg: dict | None = None
    frozen_stages: int = -1
    norm_eval: bool = True
    pretrained: str | None = None

    @nn.compact
    def __call__(self, x):
        extra = self.extra or DEFAULT_EXTRA
        # stem: 2x stride-2 3x3 to 64 channels
        x = _conv3(64, 2, "conv1")(x)
        x = nn.relu(make_norm(self.norm_cfg, name="bn1")(x))
        x = _conv3(64, 2, "conv2")(x)
        x = nn.relu(make_norm(self.norm_cfg, name="bn2")(x))

        # stage 1 (Bottleneck chain)
        s1 = extra["stage1"]
        for k in range(s1["num_blocks"][0]):
            x = _Bottleneck(s1["num_channels"][0], self.norm_cfg,
                            name=f"layer1_{k}")(x)

        xs = [x]
        prev_channels = [s1["num_channels"][0] * 4]
        for si, key in enumerate(["stage2", "stage3", "stage4"]):
            cfg = extra[key]
            nb = cfg["num_branches"]
            chans = list(cfg["num_channels"])
            # transition: adapt existing branches / create new ones
            new_xs = []
            for b in range(nb):
                if b < len(xs):
                    if prev_channels[b] != chans[b]:
                        y = _conv3(chans[b], 1,
                                   f"transition{si}_{b}_conv")(xs[b])
                        y = nn.relu(make_norm(
                            self.norm_cfg, name=f"transition{si}_{b}_bn")(y))
                    else:
                        y = xs[b]
                else:           # new (lower-res) branch from the last one
                    y = xs[-1]
                    y = _conv3(chans[b], 2, f"transition{si}_{b}_conv")(y)
                    y = nn.relu(make_norm(
                        self.norm_cfg, name=f"transition{si}_{b}_bn")(y))
                new_xs.append(y)
            xs = new_xs
            for m in range(cfg["num_modules"]):
                xs = HRModule(num_branches=nb,
                              num_blocks=cfg["num_blocks"],
                              channels=chans, norm_cfg=self.norm_cfg,
                              name=f"{key}_module{m}")(xs)
            prev_channels = chans
        return tuple(xs)
