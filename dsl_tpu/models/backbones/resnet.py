"""ResNet backbone (caffe / pytorch styles), flax NHWC.

Functional parity with ``/root/reference/mmdet/models/backbones/resnet.py``
for the configurations the DSL configs use: depth 50, out_indices (0,1,2,3),
``style='caffe'`` (stride on the 1x1 conv) or ``'pytorch'`` (stride on the
3x3), frozen stem+stage-1 (``frozen_stages=1``) and ``norm_eval=True``.

Freezing is not expressed here (a flax module has no parameter state); the
optimizer applies a zero-update mask over the frozen parameter subtree — see
``dsl_tpu/train/optim.py``. Norm-eval is inherent: BN layers are
FrozenBatchNorm (see layers.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.layers import (
    conv1x1, conv3x3, make_norm, max_pool_3x3_s2)

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    style: str = "pytorch"
    norm_cfg: dict | None = None
    conv_cfg: dict | None = None
    avg_down: bool = False
    zero_init_residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv3x3(self.planes, self.stride, name="conv1",
                      conv_cfg=self.conv_cfg)(x)
        out = make_norm(self.norm_cfg, name="bn1")(out)
        out = nn.relu(out)
        out = conv3x3(self.planes, 1, self.dilation, name="conv2",
                      conv_cfg=self.conv_cfg)(out)
        # mmdet init_weights: zero_init_residual -> norm2.weight = 0
        out = make_norm(self.norm_cfg, name="bn2",
                        zero_init=self.zero_init_residual)(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            ds_stride = self.stride
            if self.avg_down and self.stride != 1:
                # V1d: avg-pool carries the stride, 1x1 conv at stride 1
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
                ds_stride = 1
            identity = conv1x1(self.planes, ds_stride,
                               name="downsample_conv",
                               conv_cfg=self.conv_cfg)(identity)
            identity = make_norm(self.norm_cfg, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    style: str = "pytorch"
    norm_cfg: dict | None = None
    dtype: Any = jnp.float32
    groups: int = 1
    base_width: int = 64
    expansion: int = 4
    conv_cfg: dict | None = None
    avg_down: bool = False
    zero_init_residual: bool = True
    dcn: dict | None = None      # dict(type='DCN'|'DCNv2') on conv2
    plugins: tuple = ()          # ((position, cfg), ...) e.g. ContextBlock

    @nn.compact
    def __call__(self, x):
        # caffe: stride on conv1 (1x1); pytorch: stride on conv2 (3x3)
        s1 = self.stride if self.style == "caffe" else 1
        s2 = 1 if self.style == "caffe" else self.stride
        out_ch = self.planes * self.expansion
        # ResNeXt: widened grouped 3x3 (width = planes*base_width/64*groups)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups

        identity = x
        out = conv1x1(width, s1, name="conv1", conv_cfg=self.conv_cfg)(x)
        out = make_norm(self.norm_cfg, name="bn1")(out)
        out = nn.relu(out)
        if self.dcn is not None:
            # mmdet stage_with_dcn: conv2 -> (modulated) deformable conv
            # (``mmcv/ops/deform_conv.py`` / ``modulated_deform_conv.py``);
            # offset conv is zero-init so the block starts as a plain conv
            from dsl_tpu.ops.deform_conv import deform_conv2d

            v2 = self.dcn.get("type", "DCNv2") in ("DCNv2", "dcnv2")
            dg = int(self.dcn.get("deform_groups", 1))
            off_ch = dg * (27 if v2 else 18)
            raw = nn.Conv(off_ch, (3, 3), strides=(s2, s2),
                          padding=((self.dilation, self.dilation),
                                   (self.dilation, self.dilation)),
                          kernel_dilation=(self.dilation, self.dilation),
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="conv2_offset")(out)
            offsets = raw[..., :dg * 18]
            dmask = jax.nn.sigmoid(raw[..., dg * 18:]) if v2 else None
            w = self.param("conv2_kernel", nn.initializers.he_normal(),
                           (3, 3, out.shape[-1] // self.groups, width))
            out = deform_conv2d(out, offsets, w, mask=dmask,
                                dilation=self.dilation, stride=s2,
                                deform_groups=dg)
        else:
            from dsl_tpu.models.layers import make_conv
            out = make_conv(self.conv_cfg, width, 3, stride=s2,
                            dilation=self.dilation, groups=self.groups,
                            name="conv2")(out)
        out = make_norm(self.norm_cfg, name="bn2")(out)
        out = nn.relu(out)
        out = self._run_plugins(out, "after_conv2")
        out = conv1x1(out_ch, 1, name="conv3", conv_cfg=self.conv_cfg)(out)
        # mmdet init_weights: zero_init_residual -> norm3.weight = 0
        out = make_norm(self.norm_cfg, name="bn3",
                        zero_init=self.zero_init_residual)(out)
        out = self._run_plugins(out, "after_conv3")
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = x
            ds_stride = self.stride
            if self.avg_down and self.stride != 1:
                # V1d: avg-pool carries the stride, 1x1 conv at stride 1
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
                ds_stride = 1
            identity = conv1x1(out_ch, ds_stride, name="downsample_conv",
                               conv_cfg=self.conv_cfg)(identity)
            identity = make_norm(self.norm_cfg, name="downsample_bn")(identity)
        return nn.relu(out + identity)

    def _run_plugins(self, out, position):
        """mmdet ``plugins`` (resnet.py make_block_plugins): ContextBlock
        (gcnet, after_conv3) and GeneralizedAttention
        (empirical_attention, after_conv2)."""
        for pi, (pos, pcfg) in enumerate(self.plugins):
            if pos != position:
                continue
            pcfg = dict(pcfg)
            ptype = pcfg.pop("type")
            if ptype == "ContextBlock":
                from dsl_tpu.models.layers import ContextBlock

                out = ContextBlock(name=f"plugin{pi}", **pcfg)(out)
            elif ptype == "GeneralizedAttention":
                from dsl_tpu.models.layers import GeneralizedAttention

                out = GeneralizedAttention(name=f"plugin{pi}", **pcfg)(out)
            else:
                raise ValueError(f"unknown plugin {ptype}")
        return out


@BACKBONES.register
class ResNet(nn.Module):
    """mmdet-parity ResNet. Returns features of the stages in out_indices.

    Note ``frozen_stages``/``norm_eval`` are carried as metadata for the
    optimizer mask and checkpoint import; they don't alter the forward.
    """

    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    style: str = "pytorch"
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: dict | None = None
    conv_cfg: dict | None = None
    pretrained: str | None = None
    zero_init_residual: bool = True   # scratch configs set False
    stem_channels: int = 64
    base_channels: int = 64
    groups: int = 1
    base_width: int = 64
    dcn: dict | None = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    plugins: Sequence[dict] | None = None   # mmdet backbone plugins
    deep_stem: bool = False     # V1d: 3x 3x3 stem convs instead of the 7x7
    avg_down: bool = False      # V1d: avg-pool downsample shortcuts

    @nn.compact
    def __call__(self, x):
        block_name, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_name == "bottleneck" else BasicBlock

        from dsl_tpu.models.layers import make_conv
        if self.deep_stem:
            # reference resnet.py _make_stem_layer deep_stem branch
            for i, (ch, s) in enumerate([(self.stem_channels // 2, 2),
                                         (self.stem_channels // 2, 1),
                                         (self.stem_channels, 1)]):
                x = make_conv(self.conv_cfg, ch, 3, stride=s,
                              name=f"stem_conv{i}")(x)
                x = nn.relu(make_norm(self.norm_cfg, name=f"stem_bn{i}")(x))
        else:
            x = make_conv(self.conv_cfg, self.stem_channels, 7, stride=2,
                          name="conv1")(x)
            x = make_norm(self.norm_cfg, name="bn1")(x)
            x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        outs = []
        for i in range(self.num_stages):
            planes = self.base_channels * 2 ** i
            for j in range(stage_blocks[i]):
                stage_plugins = tuple(
                    (p.get("position", "after_conv3"), p["cfg"])
                    for p in (self.plugins or ())
                    if p.get("stages", (True,) * 4)[i])
                if block_cls is Bottleneck:
                    kwargs = dict(groups=self.groups,
                                  base_width=self.base_width,
                                  dcn=(self.dcn if self.stage_with_dcn[i]
                                       else None),
                                  plugins=stage_plugins)
                else:
                    # mmdet BasicBlock asserts dcn/plugins are None
                    # (reference mmdet/models/backbones/resnet.py:31-33) —
                    # reject loudly instead of silently computing plain convs
                    if self.dcn is not None and self.stage_with_dcn[i]:
                        raise NotImplementedError(
                            "dcn on BasicBlock (depth<50) is not supported "
                            "(mmdet parity: BasicBlock asserts dcn is None)")
                    if stage_plugins:
                        raise NotImplementedError(
                            "plugins on BasicBlock are not supported")
                    kwargs = {}
                x = block_cls(
                    planes=planes,
                    stride=self.strides[i] if j == 0 else 1,
                    dilation=self.dilations[i],
                    style=self.style,
                    norm_cfg=self.norm_cfg,
                    conv_cfg=self.conv_cfg,
                    avg_down=self.avg_down,
                    zero_init_residual=self.zero_init_residual,
                    name=f"layer{i + 1}_{j}", **kwargs)(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register(name="ResNetV1d")
class ResNetV1d(ResNet):
    """ResNet-V1d (``mmdet/models/backbones/resnet.py ResNetV1d``): deep
    3x3 stem + avg-pool downsample shortcuts."""

    deep_stem: bool = True
    avg_down: bool = True


@BACKBONES.register(name="ResNeXt")
class ResNeXt(ResNet):
    """ResNeXt: grouped-conv bottlenecks (``mmdet/models/backbones/resnext.py``
    parity; e.g. groups=32, base_width=4 for ResNeXt-50-32x4d)."""

    groups: int = 32
    base_width: int = 4
