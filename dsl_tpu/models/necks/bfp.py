"""BFP — Balanced Feature Pyramid neck (Libra R-CNN).

Parity with ``/root/reference/mmdet/models/necks/bfp.py``: gather every FPN
level to the ``refine_level`` resolution, average, refine with a 3x3 conv
(the reference also offers non-local; conv is the detection default here),
then scatter the residual back to every level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import MODELS


def _resize(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="nearest")


@MODELS.register
class BFP(nn.Module):
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: str = "conv"        # 'conv' | None

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == self.num_levels
        target_hw = feats[self.refine_level].shape[1:3]
        gathered = []
        for i, f in enumerate(feats):
            if i < self.refine_level:
                k = 2 ** (self.refine_level - i)
                g = nn.max_pool(f, (k, k), strides=(k, k))
            elif i > self.refine_level:
                g = _resize(f, target_hw)
            else:
                g = f
            gathered.append(g)
        bsf = sum(gathered) / self.num_levels
        if self.refine_type == "conv":
            bsf = nn.Conv(self.in_channels, (3, 3), padding=1,
                          kernel_init=nn.initializers.he_normal(),
                          name="refine")(bsf)
        outs = []
        for i, f in enumerate(feats):
            outs.append(f + _resize(bsf, f.shape[1:3]))
        return tuple(outs)
