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


def _upsample_nearest_2x(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    """Nearest-neighbor upsample to the lateral's (H, W)."""
    b, h, w, c = x.shape
    th, tw = target_hw
    out = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return out[:, :th, :tw, :]


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
    upsample_cfg: dict | None = None

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        used = list(inputs[self.start_level:end])
        n_used = len(used)

        # build laterals
        laterals = [
            nn.Conv(self.out_channels, (1, 1), padding="VALID",
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f"lateral_conv{i}")(used[i])
            for i in range(n_used)
        ]
        # top-down pathway
        for i in range(n_used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i], laterals[i - 1].shape[1:3])
        # output convs
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f"fpn_conv{i}")(laterals[i])
            for i in range(n_used)
        ]
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
                    src = nn.Conv(
                        self.out_channels, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"extra_conv{i}")(src)
                    outs.append(src)
        return tuple(outs)
