"""RegNet backbone (flax NHWC).

Parity with ``/root/reference/mmdet/models/backbones/regnet.py``: stage
widths/depths generated from the (w0, wa, wm, depth) quantized-linear rule,
grouped 3x3 bottlenecks with bottleneck_ratio 1, a 32-channel stride-2 3x3
stem (no maxpool), each stage starting with stride 2. Named arches match the
mmdet dict (regnetx_400mf … regnetx_12gf).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.layers import conv1x1, make_norm

ARCH_PARAMS = {
    "regnetx_400mf": dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22),
    "regnetx_800mf": dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16),
    "regnetx_1.6gf": dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18),
    "regnetx_3.2gf": dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25),
    "regnetx_4.0gf": dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23),
    "regnetx_6.4gf": dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17),
    "regnetx_8.0gf": dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23),
    "regnetx_12gf": dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19),
}


def generate_regnet(w0, wa, wm, depth, group_w=1, q=8):
    """Quantized-linear widths + group-width adjustment ->
    (stage_widths, stage_depths) (pycls/mmdet generate_regnet +
    adjust_width_group)."""
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = np.round(widths / q) * q
    # adjust to group width: w -> round(w / g) * g with g = min(group_w, w)
    adj = []
    for wv in widths.astype(int):
        g = min(group_w, int(wv))
        adj.append(int(round(wv / g) * g))
    seen, sw, sd = set(), [], []
    for wv in adj:
        if wv not in seen:
            seen.add(wv)
            sw.append(wv)
            sd.append(adj.count(wv))
    return sw, sd


class RegBlock(nn.Module):
    width: int
    stride: int
    group_width: int
    norm_cfg: dict | None = None
    dcn: dict | None = None      # dict(type='DCN'|'DCNv2') on the 3x3 conv

    @nn.compact
    def __call__(self, x):
        groups = max(1, self.width // self.group_width)
        identity = x
        out = conv1x1(self.width, 1, name="conv1")(x)
        out = nn.relu(make_norm(self.norm_cfg, name="bn1")(out))
        if self.dcn is not None:
            # stage_with_dcn parity (reference regnet.py reuses the ResNet
            # bottleneck dcn path); offset conv zero-init → starts as a
            # plain conv (DCNv1)
            import jax
            from dsl_tpu.ops.deform_conv import deform_conv2d

            v2 = self.dcn.get("type", "DCNv2") in ("DCNv2", "dcnv2")
            off_ch = 27 if v2 else 18
            raw = nn.Conv(off_ch, (3, 3), strides=(self.stride, self.stride),
                          padding=1, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="conv2_offset")(out)
            offsets = raw[..., :18]
            dmask = jax.nn.sigmoid(raw[..., 18:]) if v2 else None
            w = self.param("conv2_kernel", nn.initializers.he_normal(),
                           (3, 3, out.shape[-1] // groups, self.width))
            out = deform_conv2d(out, offsets, w, mask=dmask,
                                stride=self.stride)
        else:
            out = nn.Conv(self.width, (3, 3),
                          strides=(self.stride, self.stride),
                          padding=1, feature_group_count=groups,
                          use_bias=False,
                          kernel_init=nn.initializers.he_normal(),
                          name="conv2")(out)
        out = nn.relu(make_norm(self.norm_cfg, name="bn2")(out))
        out = conv1x1(self.width, 1, name="conv3")(out)
        out = make_norm(self.norm_cfg, name="bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.width:
            identity = conv1x1(self.width, self.stride,
                               name="downsample_conv")(x)
            identity = make_norm(self.norm_cfg,
                                 name="downsample_bn")(identity)
        return nn.relu(out + identity)


@BACKBONES.register
class RegNet(nn.Module):
    arch: str = "regnetx_3.2gf"
    out_indices: Sequence[int] = (0, 1, 2, 3)
    strides: Sequence[int] = (2, 2, 2, 2)
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: dict | None = None
    pretrained: str | None = None
    dcn: dict | None = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, x):
        p = ARCH_PARAMS[self.arch]
        widths, depths = generate_regnet(p["w0"], p["wa"], p["wm"],
                                         p["depth"], p["group_w"])
        assert len(widths) == 4, (widths, depths)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    kernel_init=nn.initializers.he_normal(), name="conv1")(x)
        x = nn.relu(make_norm(self.norm_cfg, name="bn1")(x))
        outs = []
        for i in range(4):
            for j in range(depths[i]):
                x = RegBlock(width=widths[i],
                             stride=self.strides[i] if j == 0 else 1,
                             group_width=p["group_w"],
                             norm_cfg=self.norm_cfg,
                             dcn=self.dcn if self.stage_with_dcn[i] else None,
                             name=f"layer{i + 1}_{j}")(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
