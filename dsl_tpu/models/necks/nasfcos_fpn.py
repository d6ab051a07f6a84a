"""NAS-FCOS FPN and FPG necks.

NASFCOS_FPN parity with ``/root/reference/mmdet/models/necks/nasfcos_fpn.py:
30-168``: BN-ReLU adapt convs on C3-C5, the searched concat-cell DAG
(f3=c22_1(f0,f1), f4=c22_2(f1,f2), f5=c32(f3,f2)... per the module-name
index encoding), outputs P3-P5 = (f9/f8/f7 + resized f5) resized back to
the input resolutions, plus act-norm-conv stride-2 extra downsamples.

FPG parity with ``mmdet/models/necks/fpg.py`` (Feature Pyramid Grids): a
grid of ``stack_times`` pathway stages, each fusing same-level, bottom-up
(stride-2 conv) and top-down (nearest upsample) neighbors with skip
connections — implemented here in its default "fusion by sum + 3x3 conv"
form.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import MODELS
from dsl_tpu.models.layers import make_norm


def _resize_to(x, hw):
    h, w = hw
    if x.shape[1] == h and x.shape[2] == w:
        return x
    if x.shape[1] > h:
        k = max(x.shape[1] // h, 1)
        return nn.max_pool(x, (k, k), strides=(k, k))[:, :h, :w]
    r = h // x.shape[1]
    return jnp.repeat(jnp.repeat(x, r, axis=1),
                      w // x.shape[2], axis=2)[:, :h, :w]


class ConcatCell(nn.Module):
    """mmcv ConcatCell: resize to the larger input, concat, then
    norm-act-conv (grouped 1x1) out conv."""

    out_channels: int

    @nn.compact
    def __call__(self, x1, x2):
        hw = max(x1.shape[1], x2.shape[1]), max(x1.shape[2], x2.shape[2])
        x1 = _resize_to(x1, hw)
        x2 = _resize_to(x2, hw)
        y = jnp.concatenate([x1, x2], axis=-1)
        y = make_norm(None, name="out_bn")(y)
        y = nn.relu(y)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       name="out_conv")(y)


@MODELS.register
class NASFCOS_FPN(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0

    @nn.compact
    def __call__(self, inputs):
        inputs = list(inputs)[self.start_level:]
        feats = []
        for i, f in enumerate(inputs):
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        name=f"adapt{i}")(f)
            feats.append(nn.relu(make_norm(None, name=f"adapt_bn{i}")(y)))
        # searched DAG (reference module names encode the input indices)
        wiring = ["c22_1", "c22_2", "c32", "c02", "c42", "c36", "c61"]
        for name in wiring:
            i1, i2 = int(name[1]), int(name[2])
            feats.append(ConcatCell(self.out_channels,
                                    name=f"cell_{name}")(feats[i1],
                                                         feats[i2]))
        outs = []
        for idx, input_idx in zip([9, 8, 7], [0, 1, 2]):
            fused = feats[idx] + _resize_to(feats[5], feats[idx].shape[1:3])
            outs.append(_resize_to(fused, inputs[input_idx].shape[1:3]))
        x = outs[-1]
        for i in range(self.num_outs - len(outs)):
            x = nn.relu(x) if i > 0 else x
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=1, name=f"extra{i}")(x)
            outs.append(x)
        return tuple(outs)


@MODELS.register
class FPG(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    start_level: int = 0

    @nn.compact
    def __call__(self, inputs):
        feats = list(inputs)[self.start_level:]
        levels = [nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(f)
                  for i, f in enumerate(feats)]
        for i in range(self.num_outs - len(levels)):
            levels.append(nn.Conv(self.out_channels, (3, 3),
                                  strides=(2, 2), padding=1,
                                  name=f"extra{i}")(levels[-1]))
        for s in range(self.stack_times):
            new = []
            for lvl in range(len(levels)):
                acc = levels[lvl]
                if lvl > 0:         # bottom-up pathway: stride-2 conv
                    acc = acc + nn.Conv(
                        self.out_channels, (3, 3), strides=(2, 2),
                        padding=1, name=f"s{s}_bu{lvl}")(levels[lvl - 1])
                if lvl < len(levels) - 1:   # top-down: nearest upsample
                    up = _resize_to(levels[lvl + 1], acc.shape[1:3])
                    acc = acc + nn.Conv(self.out_channels, (1, 1),
                                        name=f"s{s}_td{lvl}")(up)
                y = nn.relu(acc)
                y = nn.Conv(self.out_channels, (3, 3), padding=1,
                            name=f"s{s}_out{lvl}")(y)
                new.append(make_norm(None, name=f"s{s}_bn{lvl}")(y))
            levels = new
        return tuple(levels)
