"""HRFPN neck (flax NHWC).

Parity with ``/root/reference/mmdet/models/necks/hrfpn.py``: bilinearly
upsample every HRNet branch to the highest resolution, concat, reduce with a
1x1 conv, build ``num_outs`` pyramid levels by average pooling (stride 2^i),
then one 3x3 conv per level.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import MODELS


@MODELS.register
class HRFPN(nn.Module):
    in_channels: Sequence[int] = (18, 36, 72, 144)
    out_channels: int = 256
    num_outs: int = 5
    pooling_type: str = "AVG"

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.in_channels)
        h, w = feats[0].shape[1:3]
        ups = [feats[0]] + [
            jax.image.resize(f, (f.shape[0], h, w, f.shape[-1]),
                             method="bilinear") for f in feats[1:]]
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1),
                    kernel_init=nn.initializers.he_normal(),
                    name="reduction_conv")(x)
        outs = []
        for i in range(self.num_outs):
            y = x
            if i > 0:
                k = 2 ** i
                if self.pooling_type == "AVG":
                    y = nn.avg_pool(x, (k, k), strides=(k, k))
                else:
                    y = nn.max_pool(x, (k, k), strides=(k, k))
            y = nn.Conv(self.out_channels, (3, 3), padding=1,
                        kernel_init=nn.initializers.he_normal(),
                        name=f"fpn_conv{i}")(y)
            outs.append(y)
        return tuple(outs)
