"""NAS-FPN neck.

Parity with ``/root/reference/mmdet/models/necks/nas_fpn.py:1-190`` and
mmcv's merge cells: 1x1 laterals (+1x1-conv/maxpool extra downsamples),
then ``stack_times`` repetitions of the searched cell wiring over
(P3..P7) with SumCells and GlobalPoolingCells (gate = sigmoid of the
global-pooled second input applied to the first, then sum).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import MODELS
from dsl_tpu.models.layers import make_norm


def _resize_to(x, hw):
    h, w = hw
    if x.shape[1] == h and x.shape[2] == w:
        return x
    if x.shape[1] > h:                                 # downsample: max pool
        k = x.shape[1] // h
        return nn.max_pool(x, (k, k), strides=(k, k))
    return jnp.repeat(jnp.repeat(x, h // x.shape[1], axis=1),
                      w // x.shape[2], axis=2)[:, :h, :w]


class _Cell(nn.Module):
    """mmcv BaseMergeCell: resize both inputs to ``out_size``, binary op,
    ReLU-first 3x3 out conv."""

    out_channels: int
    op: str = "sum"            # 'sum' | 'gp'
    with_out_conv: bool = True
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x1, x2, out_hw):
        x1 = _resize_to(x1, out_hw)
        x2 = _resize_to(x2, out_hw)
        if self.op == "gp":
            att = jax.nn.sigmoid(x2.mean(axis=(1, 2), keepdims=True))
            y = x2 + att * x1
        else:
            y = x1 + x2
        if self.with_out_conv:
            y = nn.relu(y)
            y = nn.Conv(self.out_channels, (3, 3), padding=1,
                        name="out_conv")(y)
            y = make_norm(self.norm_cfg, name="out_bn")(y)
        return y


@MODELS.register
class NASFPN(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, feats):
        feats = list(feats)[self.start_level:]
        outs = []
        for i, f in enumerate(feats):
            outs.append(nn.Conv(self.out_channels, (1, 1),
                                name=f"lateral{i}")(f))
        for i in range(self.num_outs - len(outs)):
            y = nn.Conv(self.out_channels, (1, 1), name=f"extra{i}")(
                outs[-1])
            if y.shape[1] > 1 or y.shape[2] > 1:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
            outs.append(y)    # floor at 1x1 (tiny-input tests only; real
            # inputs are >=2^num_levels so the pool always applies)
        p3, p4, p5, p6, p7 = outs
        hw = lambda t: t.shape[1:3]
        for s in range(self.stack_times):
            p4_1 = _Cell(self.out_channels, "gp", norm_cfg=self.norm_cfg,
                         name=f"s{s}_gp_64_4")(p6, p4, hw(p4))
            p4_2 = _Cell(self.out_channels, "sum", norm_cfg=self.norm_cfg,
                         name=f"s{s}_sum_44_4")(p4_1, p4, hw(p4))
            p3 = _Cell(self.out_channels, "sum", norm_cfg=self.norm_cfg,
                       name=f"s{s}_sum_43_3")(p4_2, p3, hw(p3))
            p4 = _Cell(self.out_channels, "sum", norm_cfg=self.norm_cfg,
                       name=f"s{s}_sum_34_4")(p3, p4_2, hw(p4))
            p5_tmp = _Cell(self.out_channels, "gp", with_out_conv=False,
                           name=f"s{s}_gp_43_5")(p4, p3, hw(p5))
            p5 = _Cell(self.out_channels, "sum", norm_cfg=self.norm_cfg,
                       name=f"s{s}_sum_55_5")(p5_tmp, p5, hw(p5))
            p7_tmp = _Cell(self.out_channels, "gp", with_out_conv=False,
                           name=f"s{s}_gp_54_7")(p5, p4_2, hw(p7))
            p7 = _Cell(self.out_channels, "sum", norm_cfg=self.norm_cfg,
                       name=f"s{s}_sum_77_7")(p7_tmp, p7, hw(p7))
            p6 = _Cell(self.out_channels, "gp", norm_cfg=self.norm_cfg,
                       name=f"s{s}_gp_75_6")(p7, p5, hw(p6))
        return p3, p4, p5, p6, p7
