"""PAFPN: FPN with an extra bottom-up path aggregation
(``/root/reference/mmdet/models/necks/pafpn.py`` parity)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from dsl_tpu.registry import NECKS
from dsl_tpu.models.necks.fpn import _upsample_nearest_2x


@NECKS.register
class PAFPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool | str = False
    relu_before_extra_convs: bool = False

    @nn.compact
    def __call__(self, inputs):
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        used = list(inputs[self.start_level:end])
        n = len(used)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), padding="VALID",
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f"lateral_conv{i}")(used[i]) for i in range(n)]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i], laterals[i - 1].shape[1:3])
        inter = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f"fpn_conv{i}")(laterals[i]) for i in range(n)]
        # bottom-up path aggregation
        for i in range(n - 1):
            down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)),
                           kernel_init=nn.initializers.xavier_uniform(),
                           name=f"downsample_conv{i}")(inter[i])
            inter[i + 1] = inter[i + 1] + down[:, :inter[i + 1].shape[1],
                                               :inter[i + 1].shape[2], :]
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f"pafpn_conv{i}")(inter[i]) if i > 0 else inter[i]
            for i in range(n)]
        # extra levels
        extra = self.num_outs - n
        if extra > 0:
            src = used[-1] if self.add_extra_convs == "on_input" else outs[-1]
            for i in range(extra):
                if i > 0 and self.relu_before_extra_convs:
                    src = nn.relu(src)
                src = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)),
                              kernel_init=nn.initializers.xavier_uniform(),
                              name=f"extra_conv{i}")(src)
                outs.append(src)
        return tuple(outs)
