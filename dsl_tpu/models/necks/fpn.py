"""Feature Pyramid Network, flax NHWC.

Parity with ``/root/reference/mmdet/models/necks/fpn.py:1-202`` for the
configurations used by the DSL configs: ``start_level=1``,
``add_extra_convs='on_output'``, ``num_outs=5``,
``relu_before_extra_convs=True`` — i.e. P3..P5 from lateral+topdown fusion,
P6/P7 from stride-2 3x3 convs on P5's output (relu in between).

Top-down upsample is nearest-2x (mmdet default interpolate mode).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import NECKS
from dsl_tpu.models.layers import make_conv, make_norm


def _upsample_nearest_2x(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    """Nearest-neighbor upsample to the lateral's (H, W)."""
    b, h, w, c = x.shape
    th, tw = target_hw
    out = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return out[:, :th, :tw, :]


def _upsample(x: jnp.ndarray, target_hw, upsample_cfg: dict | None):
    """Top-down upsample honoring ``upsample_cfg`` (mmdet ``fpn.py:119-124``
    passes it to ``F.interpolate(size=prev_shape, **upsample_cfg)``).
    'nearest' (default) and 'bilinear' (align_corners=False — YOLACT's
    ``neck.upsample_cfg=dict(mode='bilinear')``) are supported."""
    mode = (upsample_cfg or {}).get("mode", "nearest")
    if mode == "nearest":
        return _upsample_nearest_2x(x, target_hw)
    if mode == "bilinear":
        import jax
        b, _, _, c = x.shape
        return jax.image.resize(x, (b, *target_hw, c), method="bilinear")
    raise ValueError(f"unsupported FPN upsample mode {mode!r}")


@NECKS.register
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool | str = False
    relu_before_extra_convs: bool = False
    no_norm_on_lateral: bool = True
    conv_cfg: dict | None = None   # dict(type='ConvWS') for gn+ws
    norm_cfg: dict | None = None   # dict(type='GN', ...) for gn(+ws)
    upsample_cfg: dict | None = None

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        used = list(inputs[self.start_level:end])
        n_used = len(used)

        # build laterals (ConvModule: conv -> optional norm, no act;
        # bias='auto' -> off when a norm follows)
        bias = self.norm_cfg is None

        def _conv(feats, k, stride, name):
            return make_conv(self.conv_cfg, feats, k, stride=stride,
                             use_bias=bias,
                             kernel_init=nn.initializers.xavier_uniform(),
                             name=name)

        laterals = []
        for i in range(n_used):
            lat = _conv(self.out_channels, 1, 1, f"lateral_conv{i}")(used[i])
            if self.norm_cfg is not None and not self.no_norm_on_lateral:
                lat = make_norm(self.norm_cfg, name=f"lateral_norm{i}")(lat)
            laterals.append(lat)
        # top-down pathway
        for i in range(n_used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample(
                laterals[i], laterals[i - 1].shape[1:3], self.upsample_cfg)
        # output convs
        outs = []
        for i in range(n_used):
            o = _conv(self.out_channels, 3, 1, f"fpn_conv{i}")(laterals[i])
            if self.norm_cfg is not None:
                o = make_norm(self.norm_cfg, name=f"fpn_norm{i}")(o)
            outs.append(o)
        # extra levels
        extra_needed = self.num_outs - n_used
        if extra_needed > 0:
            if not self.add_extra_convs:
                for _ in range(extra_needed):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                mode = (self.add_extra_convs
                        if isinstance(self.add_extra_convs, str)
                        else "on_input")
                if mode == "on_input":
                    src = used[-1]
                elif mode == "on_lateral":
                    src = laterals[-1]
                else:  # 'on_output'
                    src = outs[-1]
                for i in range(extra_needed):
                    if i > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    src = _conv(self.out_channels, 3, 2,
                                f"extra_conv{i}")(src)
                    if self.norm_cfg is not None:
                        src = make_norm(self.norm_cfg,
                                        name=f"extra_norm{i}")(src)
                    outs.append(src)
        return tuple(outs)
