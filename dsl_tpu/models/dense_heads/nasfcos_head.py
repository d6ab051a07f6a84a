"""NAS-FCOS head: FCOS with the searched tower structure.

Parity with ``/root/reference/mmdet/models/dense_heads/nasfcos_head.py:
10-79``: the cls/reg towers are the searched "dconv3x3 (DCNv2, groups 2),
conv3x3, dconv3x3, conv1x1" sequence (each with GN); losses/decode are the
FCOS functions (the head only changes the feature extractor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.models.dense_heads.fcos_head import FCOSHead
from dsl_tpu.models.layers import Scale, bias_init_with_prob, normal_init
from dsl_tpu.ops.deform_conv import deform_conv2d


class _DConv3x3(nn.Module):
    """DCNv2 3x3 + GN + ReLU (the searched deformable op)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        om = nn.Conv(27, (3, 3), padding=1,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="conv_offset")(x)
        offsets, mask = om[..., :18], jax.nn.sigmoid(om[..., 18:])
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1], self.channels))
        y = deform_conv2d(x, offsets, w, mask=mask)
        return nn.relu(nn.GroupNorm(num_groups=32, name="gn")(y))


class _Conv(nn.Module):
    channels: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (self.kernel, self.kernel),
                    padding=self.kernel // 2, name="conv")(x)
        return nn.relu(nn.GroupNorm(num_groups=32, name="gn")(y))


@HEADS.register
class NASFCOSHead(FCOSHead):
    @nn.compact
    def __call__(self, feats, training: bool = False):
        def tower(tag):
            return [_DConv3x3(self.feat_channels, name=f"{tag}_op0"),
                    _Conv(self.feat_channels, 3, name=f"{tag}_op1"),
                    _DConv3x3(self.feat_channels, name=f"{tag}_op2"),
                    _Conv(self.feat_channels, 1, name=f"{tag}_op3")]

        cls_tower = tower("cls")
        reg_tower = tower("reg")
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                           kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1,
                           kernel_init=normal_init(0.01), name="conv_reg")
        conv_centerness = nn.Conv(1, (3, 3), padding=1,
                                  kernel_init=normal_init(0.01),
                                  name="conv_centerness")
        scales = [Scale(name=f"scale{i}") for i in range(len(self.strides))]

        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for op in cls_tower:
                cf = op(cf)
            for op in reg_tower:
                rf = op(rf)
            cls_scores.append(conv_cls(cf))
            bbox_pred = scales[lvl](conv_reg(rf))
            cent_feat = rf if self.centerness_on_reg else cf
            centernesses.append(conv_centerness(cent_feat))
            if self.norm_on_bbox:
                bbox_pred = nn.relu(bbox_pred)
                if not training:
                    bbox_pred = bbox_pred * self.strides[lvl]
            else:
                bbox_pred = jnp.exp(bbox_pred)
            bbox_preds.append(bbox_pred)
        return tuple(cls_scores), tuple(bbox_preds), tuple(centernesses)
