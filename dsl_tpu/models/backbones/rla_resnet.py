"""RLA-ResNet: ResNet-50 with Recurrent Layer Aggregation, flax NHWC.

Parity with ``/root/reference/mmdet/models/backbones/resnet_rla.py:141-386``:
a ``rla_channel``-wide hidden state ``h`` (initialized to zeros at stem
resolution) is concatenated to every bottleneck's input; after each block the
block's residual-branch output ``y`` is folded back into ``h`` via
1x1 conv -> += -> BN -> tanh -> shared-per-stage 3x3 recurrent conv; ``h`` is
2x2 average-pooled whenever the block downsamples. Optional SE / ECA
attention on the residual branch matches ``:12-57``.

TPU notes: the recurrence over blocks is a static python loop (16 blocks for
R50) — XLA unrolls and fuses it; ``h`` is only 32 channels so the extra
bandwidth is negligible next to the 256-2048ch trunk.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import BACKBONES
from dsl_tpu.models.layers import conv1x1, conv3x3, make_norm, max_pool_3x3_s2


class SELayer(nn.Module):
    """Squeeze-excitation (``resnet_rla.py:12-31``)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))                       # (B, C)
        s = nn.Dense(c // self.reduction, use_bias=False, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, use_bias=False, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class ECALayer(nn.Module):
    """Efficient channel attention (``resnet_rla.py:34-57``): 1D conv over
    the channel axis of the pooled descriptor."""

    k_size: int = 3

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))                       # (B, C)
        pad = (self.k_size - 1) // 2
        s = nn.Conv(1, (self.k_size,), padding=((pad, pad),), use_bias=False,
                    name="conv")(s[..., None])[..., 0]     # (B, C)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class RLABottleneck(nn.Module):
    """Bottleneck consuming concat(x, h) (``resnet_rla.py:71-137``).

    Returns (out, y, h_pooled): y is the pre-residual branch output used for
    the RLA update; h is average-pooled 2x2 when this block strides.
    """

    planes: int
    stride: int = 1
    has_downsample: bool = False
    se: bool = False
    eca_size: int | None = None
    norm_cfg: dict | None = None
    expansion: int = 4
    zero_init_last_bn: bool = True

    @nn.compact
    def __call__(self, x, h):
        identity = x
        xin = jnp.concatenate([x, h], axis=-1)

        out = conv1x1(self.planes, 1, name="conv1")(xin)
        out = make_norm(self.norm_cfg, name="bn1")(out)
        out = nn.relu(out)
        # torchvision-style: stride on the 3x3
        out = conv3x3(self.planes, self.stride, name="conv2")(out)
        out = make_norm(self.norm_cfg, name="bn2")(out)
        out = nn.relu(out)
        out = conv1x1(self.planes * self.expansion, 1, name="conv3")(out)
        # reference init_weights zero-inits each block's last BN gamma
        # (``resnet_rla.py:153-166`` zero_init_last_bn) so the residual
        # branch starts as identity
        out = make_norm(self.norm_cfg, name="bn3",
                        zero_init=self.zero_init_last_bn)(out)

        if self.se:
            out = SELayer(name="se")(out)
        if self.eca_size is not None:
            out = ECALayer(k_size=self.eca_size, name="eca")(out)

        y = out
        if self.has_downsample:
            identity = conv1x1(self.planes * self.expansion, self.stride,
                               name="downsample_conv")(x)
            identity = make_norm(self.norm_cfg, name="downsample_bn")(identity)
        if self.has_downsample and self.stride != 1:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        out = nn.relu(out + identity)
        return out, y, h


@BACKBONES.register(name="RLA_ResNet")
class RLAResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    rla_channel: int = 32
    SE: bool = False
    ECA: Sequence[int] | None = None
    frozen_stages: int = -1
    norm_eval: bool = True
    style: str = "pytorch"        # accepted for config parity; RLA blocks are
    norm_cfg: dict | None = None  # torchvision-style regardless (reference too)
    pretrained: str | None = None
    num_classes: int = 1000       # unused (cls head stripped, like reference)
    zero_init_last_bn: bool = True

    @nn.compact
    def __call__(self, x):
        eca = self.ECA if self.ECA is not None else [None] * 4
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=nn.initializers.he_normal(),
                    name="conv1")(x)
        x = make_norm(self.norm_cfg, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        b = x.shape[0]
        h = jnp.zeros((b, x.shape[1], x.shape[2], self.rla_channel), x.dtype)

        outs = []
        inplanes = 64
        for stage in range(4):
            planes = 64 * 2 ** stage
            stride0 = 1 if stage == 0 else 2
            # shared per-stage RLA convs (reference `conv_out`/`recurrent_conv`
            # are created per stage in `_make_layer`)
            conv_out = conv1x1(self.rla_channel, 1,
                               name=f"conv_out{stage}")
            recurrent_conv = conv3x3(self.rla_channel, 1,
                                     name=f"recurrent_conv{stage}")
            for blk in range(self.layers[stage]):
                stride = stride0 if blk == 0 else 1
                has_ds = (stride != 1 or inplanes != planes * 4) and blk == 0
                x, y, h = RLABottleneck(
                    planes=planes, stride=stride, has_downsample=has_ds,
                    se=self.SE, eca_size=eca[stage], norm_cfg=self.norm_cfg,
                    zero_init_last_bn=self.zero_init_last_bn,
                    name=f"layer{stage + 1}_{blk}")(x, h)
                inplanes = planes * 4
                # RLA update (`resnet_rla.py:303-310`)
                h = h + conv_out(y)
                h = make_norm(self.norm_cfg,
                              name=f"stage_bn{stage}_{blk}")(h)
                h = jnp.tanh(h)
                h = recurrent_conv(h)
            outs.append(x)
        return tuple(outs)
