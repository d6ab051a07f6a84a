"""RFP (Recursive Feature Pyramid) neck for DetectoRS.

Parity with ``/root/reference/mmdet/models/necks/rfp.py:11-134``: standard
FPN, then ``rfp_steps-1`` recursive passes — ASPP-transformed pyramid
features are fed back into a second (unshared) DetectoRS backbone via
``rfp_forward``, the new pyramid is fused with the old through a
zero-init sigmoid gate.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import MODELS, build_from_cfg
from dsl_tpu.models.necks.fpn import FPN


class ASPP(nn.Module):
    """(reference :11-56) four branches (1x1, 3x3 d3, 3x3 d6, gap-1x1),
    concatenated."""

    out_channels: int = 64
    dilations: Sequence[int] = (1, 3, 6, 1)

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, d in enumerate(self.dilations):
            k = 3 if d > 1 else 1
            inp = x.mean(axis=(1, 2), keepdims=True) \
                if i == len(self.dilations) - 1 else x
            y = nn.Conv(self.out_channels, (k, k), padding=d if d > 1 else 0,
                        kernel_dilation=(d, d), name=f"aspp{i}")(inp)
            outs.append(nn.relu(y))
        outs[-1] = jnp.broadcast_to(outs[-1], outs[-2].shape)
        return jnp.concatenate(outs, axis=-1)


@MODELS.register
class RFP(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    rfp_steps: int = 2
    aspp_out_channels: int = 64
    aspp_dilations: Sequence[int] = (1, 3, 6, 1)
    rfp_backbone: dict | None = None
    start_level: int = 0

    def setup(self):
        self.fpn = FPN(in_channels=list(self.in_channels),
                       out_channels=self.out_channels,
                       start_level=self.start_level,
                       num_outs=self.num_outs)
        self.rfp_modules = [build_from_cfg(dict(self.rfp_backbone), MODELS)
                            for _ in range(self.rfp_steps - 1)]
        self.rfp_aspp = ASPP(self.aspp_out_channels, self.aspp_dilations)
        self.rfp_weight = nn.Conv(1, (1, 1),
                                  kernel_init=nn.initializers.zeros,
                                  bias_init=nn.initializers.zeros)

    def __call__(self, inputs):
        """inputs: (image, C2, C3, C4, C5)."""
        img = inputs[0]
        x = self.fpn(tuple(inputs[1:]))
        for step in range(self.rfp_steps - 1):
            # stages 2-4 receive ASPP(P3..P5) (reference :120-123; P2 unused)
            rfp_feats = [self.rfp_aspp(x[i]) for i in range(1, 4)]
            feats = self.rfp_modules[step].rfp_forward(img, rfp_feats)
            x_idx = self.fpn(feats)
            x_new = []
            for ft in range(len(x_idx)):
                w = jax.nn.sigmoid(self.rfp_weight(x_idx[ft]))
                x_new.append(w * x_idx[ft] + (1 - w) * x[ft])
            x = tuple(x_new)
        return x
