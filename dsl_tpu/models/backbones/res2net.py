"""Res2Net backbone (flax NHWC).

Parity with ``/root/reference/mmdet/models/backbones/res2net.py``:
Bottle2neck splits the 1x1 output into ``scales`` groups and runs a
hierarchical cascade of 3x3 convs (each group adds the previous group's
output, except in 'stage' blocks where the cascade restarts and the last
split is average-pooled); downsample is the avg-pool + 1x1 variant
(``avg_down``). Defaults scales=4, base_width=26 (Res2Net-50-26w-4s).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.layers import conv1x1, make_norm, max_pool_3x3_s2

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    scales: int = 4
    base_width: int = 26
    stage_type: str = "normal"      # 'stage' for the first block of a stage
    norm_cfg: dict | None = None
    dcn: dict | None = None         # (modulated) DCN on the scale convs
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * self.base_width / 64.0)
        out_ch = self.planes * self.expansion
        identity = x

        out = conv1x1(width * self.scales, 1, name="conv1")(x)
        out = nn.relu(make_norm(self.norm_cfg, name="bn1")(out))
        spx = jnp.split(out, self.scales, axis=-1)

        sp = None
        pieces = []
        for i in range(self.scales - 1):
            inp = spx[i] if (i == 0 or self.stage_type == "stage") \
                else sp + spx[i]
            if self.dcn is not None:
                # reference res2net.py Bottle2neck: with_dcn builds every
                # scale conv from the dcn cfg
                import jax
                from dsl_tpu.ops.deform_conv import deform_conv2d

                v2 = self.dcn.get("type", "DCNv2") in ("DCNv2", "dcnv2")
                dg = int(self.dcn.get("deform_groups", 1))
                raw = nn.Conv(dg * (27 if v2 else 18), (3, 3),
                              strides=(self.stride, self.stride), padding=1,
                              kernel_init=nn.initializers.zeros,
                              bias_init=nn.initializers.zeros,
                              name=f"conv2_{i}_offset")(inp)
                offs = raw[..., :dg * 18]
                m = jax.nn.sigmoid(raw[..., dg * 18:]) if v2 else None
                w = self.param(f"conv2_{i}_kernel",
                               nn.initializers.he_normal(),
                               (3, 3, inp.shape[-1], width))
                sp = deform_conv2d(inp, offs, w, mask=m, stride=self.stride,
                                   deform_groups=dg)
            else:
                sp = nn.Conv(width, (3, 3),
                             strides=(self.stride, self.stride),
                             padding=1, use_bias=False,
                             kernel_init=nn.initializers.he_normal(),
                             name=f"conv2_{i}")(inp)
            sp = nn.relu(make_norm(self.norm_cfg, name=f"bn2_{i}")(sp))
            pieces.append(sp)
        last = spx[-1]
        if self.stride != 1:
            # 'stage' blocks average-pool the untouched split to match stride
            last = nn.avg_pool(last, (3, 3), strides=(self.stride,
                                                      self.stride),
                               padding=((1, 1), (1, 1)))
        pieces.append(last)
        out = jnp.concatenate(pieces, axis=-1)

        out = conv1x1(out_ch, 1, name="conv3")(out)
        out = make_norm(self.norm_cfg, name="bn3")(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            # avg_down downsample: avgpool(stride) + 1x1 conv(stride 1) + bn
            idn = x
            if self.stride != 1:
                idn = nn.avg_pool(idn, (self.stride, self.stride),
                                  strides=(self.stride, self.stride))
            identity = conv1x1(out_ch, 1, name="downsample_conv")(idn)
            identity = make_norm(self.norm_cfg, name="downsample_bn")(
                identity)
        return nn.relu(out + identity)


@BACKBONES.register
class Res2Net(nn.Module):
    depth: int = 50
    scales: int = 4
    base_width: int = 26
    out_indices: Sequence[int] = (0, 1, 2, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: dict | None = None
    pretrained: str | None = None
    style: str = "pytorch"          # accepted for config parity
    base_channels: int = 64
    dcn: dict | None = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, x):
        if self.style != "pytorch":
            raise NotImplementedError(
                "Res2Net: only style='pytorch' (the reference's res2net "
                f"configs all use it), got {self.style!r}")
        stage_blocks = ARCH[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=nn.initializers.he_normal(), name="conv1")(x)
        x = nn.relu(make_norm(self.norm_cfg, name="bn1")(x))
        x = max_pool_3x3_s2(x)
        outs = []
        for i in range(4):
            planes = self.base_channels * 2 ** i
            for j in range(stage_blocks[i]):
                x = Bottle2neck(
                    planes=planes,
                    stride=self.strides[i] if j == 0 else 1,
                    scales=self.scales, base_width=self.base_width,
                    stage_type="stage" if j == 0 else "normal",
                    norm_cfg=self.norm_cfg,
                    dcn=self.dcn if self.stage_with_dcn[i] else None,
                    name=f"layer{i + 1}_{j}")(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
