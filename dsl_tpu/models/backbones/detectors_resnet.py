"""DetectoRS backbone: ResNet with SAC and RFP connections.

Parity with ``/root/reference/mmdet/models/backbones/detectors_resnet.py:
15-352`` (bottlenecks whose conv2 is a Switchable Atrous Convolution and
whose first block per stage accepts an ``rfp_feat`` through a zero-init 1x1)
and mmcv's ``SAConv2d``: out = switch * conv(x, w, d=1) +
(1 - switch) * conv(x, w + Δw, d=3), with global-context 1x1s before and
after; the switch is a 1x1 conv on a 5x5-avg-pooled input.

``rfp_forward`` reruns the stages with the RFP features injected — the
Recursive Feature Pyramid step (``necks/rfp.py``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.layers import make_norm

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class SAConv(nn.Module):
    """Switchable Atrous Convolution (mmcv ``saconv.py`` semantics).

    ``groups`` makes the switchable 3x3 grouped (ResNeXt bottlenecks,
    ``detectors_resnext.py``)."""

    channels: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        s = self.stride
        # pre-context: global pooled 1x1 added to the input
        pre = nn.Conv(x.shape[-1], (1, 1), name="pre_context")(
            x.mean(axis=(1, 2), keepdims=True))
        x = x + pre
        # switch: 1x1 on 5x5-avg input
        avg = nn.avg_pool(x, (5, 5), strides=(1, 1),
                          padding=((2, 2), (2, 2)))
        switch = nn.sigmoid(nn.Conv(1, (1, 1),
                                    bias_init=nn.initializers.ones,
                                    name="switch")(avg))
        if s > 1:
            switch = switch[:, ::s, ::s]
        w = self.param("weight", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1] // self.groups, self.channels))
        dw = self.param("weight_diff", nn.initializers.zeros, w.shape)
        import jax.lax as lax

        dn = ("NHWC", "HWIO", "NHWC")
        out1 = lax.conv_general_dilated(x, w, (s, s), ((1, 1), (1, 1)),
                                        feature_group_count=self.groups,
                                        dimension_numbers=dn)
        out2 = lax.conv_general_dilated(x, w + dw, (s, s), ((3, 3), (3, 3)),
                                        rhs_dilation=(3, 3),
                                        feature_group_count=self.groups,
                                        dimension_numbers=dn)
        out = switch * out1 + (1 - switch) * out2
        post = nn.Conv(self.channels, (1, 1), name="post_context")(
            out.mean(axis=(1, 2), keepdims=True))
        return out + post


class RFPBottleneck(nn.Module):
    planes: int
    stride: int = 1
    with_sac: bool = False
    rfp_in: bool = False         # first block of a stage accepts rfp_feat
    rfp_channels: int = 256
    norm_cfg: dict | None = None
    groups: int = 1              # ResNeXt grouping (detectors_resnext.py)
    base_width: int = 64

    @nn.compact
    def __call__(self, x, rfp_feat=None):
        out_ch = self.planes * 4
        width = self.planes if self.groups == 1 else \
            int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(make_norm(self.norm_cfg, name="bn1")(y))
        if self.with_sac:
            y = SAConv(width, stride=self.stride, groups=self.groups,
                       name="conv2")(y)
        else:
            y = nn.Conv(width, (3, 3),
                        strides=(self.stride, self.stride), padding=1,
                        feature_group_count=self.groups,
                        use_bias=False, name="conv2")(y)
        y = nn.relu(make_norm(self.norm_cfg, name="bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = make_norm(self.norm_cfg, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            identity = make_norm(self.norm_cfg,
                                 name="downsample_bn")(identity)
        out = y + identity
        if self.rfp_in:
            # zero-init rfp connection (:60-71); when called without an rfp
            # feature (plain forward / init) the conv params are still
            # created but contribute nothing
            rfp_conv = nn.Conv(out_ch, (1, 1),
                               kernel_init=nn.initializers.zeros,
                               bias_init=nn.initializers.zeros,
                               name="rfp_conv")
            if rfp_feat is not None:
                out = out + rfp_conv(rfp_feat)
            else:
                _ = rfp_conv(jnp.zeros(out.shape[:3] + (self.rfp_channels,),
                                       out.dtype))
        return nn.relu(out)


@BACKBONES.register
class DetectoRSResNet(nn.Module):
    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    sac_stages: Sequence[int] = (1, 2, 3)    # conv2->SAC in stages 2-4
    stem_channels: int = 64
    rfp_inplanes: int | None = 256           # RFP feature channels
    norm_cfg: dict | None = None
    groups: int = 1                          # ResNeXt variant
    base_width: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        blocks = ARCH[self.depth]
        self.stem_conv = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2),
                                 padding=3, use_bias=False)
        self.stem_bn = make_norm(self.norm_cfg)
        stages = []
        planes = 64
        for stage, n in enumerate(blocks):
            blks = []
            for blk in range(n):
                stride = 2 if (stage > 0 and blk == 0) else 1
                blks.append(RFPBottleneck(
                    planes=planes, stride=stride,
                    with_sac=stage in self.sac_stages,
                    rfp_in=(blk == 0 and stage > 0
                            and self.rfp_inplanes is not None),
                    rfp_channels=self.rfp_inplanes or 256,
                    norm_cfg=self.norm_cfg,
                    groups=self.groups, base_width=self.base_width))
            stages.append(blks)
            planes *= 2
        self.stages = stages

    def _run(self, images, rfp_feats=None):
        x = nn.relu(self.stem_bn(self.stem_conv(images)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for stage, blks in enumerate(self.stages):
            rfp = None if (rfp_feats is None or stage == 0) \
                else rfp_feats[stage - 1]
            for blk, mod in enumerate(blks):
                x = mod(x, rfp if blk == 0 else None)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)

    def __call__(self, images, training: bool = False):
        return self._run(images)

    def rfp_forward(self, images, rfp_feats):
        """Rerun with RFP features injected into stages 2-4
        (reference ``rfp_forward`` :74-115)."""
        return self._run(images, rfp_feats)


@BACKBONES.register
class DetectoRSResNeXt(DetectoRSResNet):
    """DetectoRS over ResNeXt (``detectors_resnext.py``): grouped, widened
    3x3 convs (width = floor(planes*base_width/64)*groups) in every
    bottleneck — including the switchable (SAC) convs; RFP plumbing
    inherited unchanged."""

    groups: int = 32
    base_width: int = 4
