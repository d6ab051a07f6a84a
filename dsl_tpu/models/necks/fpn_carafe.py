"""FPN with CARAFE upsampling.

Parity with ``/root/reference/mmdet/models/necks/fpn_carafe.py``: the FPN
top-down pathway upsamples with content-aware reassembly (CARAFE) instead
of nearest interpolation — a small conv predicts per-pixel k x k
reassembly kernels (``ops/misc_ops.py::carafe``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import MODELS
from dsl_tpu.ops.misc_ops import carafe


class CARAFEUpsample(nn.Module):
    """mmcv ``CARAFEPack``: channel compressor + kernel-prediction conv."""

    channels: int
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64
    scale: int = 2

    @nn.compact
    def __call__(self, x):
        k2 = self.up_kernel ** 2
        c = nn.Conv(self.compressed_channels, (1, 1),
                    name="channel_compressor")(x)
        masks = nn.Conv(k2 * self.scale ** 2,
                        (self.encoder_kernel, self.encoder_kernel),
                        padding=self.encoder_kernel // 2,
                        name="content_encoder")(c)
        b, h, w, _ = masks.shape
        # pixel-shuffle to (B, H*scale, W*scale, k2) then softmax
        masks = masks.reshape(b, h, w, self.scale, self.scale, k2)
        masks = masks.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * self.scale, w * self.scale, k2)
        masks = jax.nn.softmax(masks, axis=-1)
        return carafe(x, masks, kernel_size=self.up_kernel,
                      scale=self.scale)


@MODELS.register
class FPN_CARAFE(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    up_kernel: int = 5

    @nn.compact
    def __call__(self, feats):
        feats = list(feats)[self.start_level:]
        laterals = [nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(f)
                    for i, f in enumerate(feats)]
        for i in range(len(laterals) - 1, 0, -1):
            up = CARAFEUpsample(self.out_channels, up_kernel=self.up_kernel,
                                name=f"up{i}")(laterals[i])
            laterals[i - 1] = laterals[i - 1] + \
                up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2]]
        outs = [nn.Conv(self.out_channels, (3, 3), padding=1,
                        name=f"fpn_conv{i}")(lat)
                for i, lat in enumerate(laterals)]
        x = outs[-1]
        for i in range(self.num_outs - len(outs)):
            x = nn.max_pool(x, (1, 1), strides=(2, 2))
            outs.append(x)
        return tuple(outs)
