"""SABL two-stage bbox head (side-aware boundary localization RoI head).

Parity with ``/root/reference/mmdet/models/roi_heads/bbox_heads/sabl_head.py
:20-583``: a cls branch (2 FCs over the flattened roi) and a side-aware reg
branch — attention-pooled x/y feature strips, 1-D post convs, 2x 1-D
transposed-conv upsampling to ``2 * side_num`` side positions, and
per-position bucket-cls / bucket-offset predictions consumed by the
bucketing coder (``core/bucket_coder.py``). Losses: CE cls, per-side BCE
bucket-cls (x1.0) + SmoothL1 offsets (beta 0.1), bucketing-guided rescoring
at test.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.bucket_coder import bbox2bucket, bucket2bbox
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import normal_init


@HEADS.register
class SABLHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    roi_size: int = 7
    cls_out_channels: int = 1024
    reg_offset_out_channels: int = 256
    reg_cls_out_channels: int = 256
    num_cls_fcs: int = 1
    num_reg_fcs: int = 0
    reg_feat_up_ratio: int = 2
    num_buckets: int = 14
    scale_factor: float = 1.7
    offset_topk: int = 2
    offset_upperbound: float = 1.0
    cls_ignore_neighbor: bool = True

    @property
    def side_num(self) -> int:
        return int(math.ceil(self.num_buckets / 2.0))

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats (N, S, S, C) -> (cls (N, C+1),
        (bucket_cls (N, 4*side), bucket_offset (N, 4*side)))."""
        n, s, _, c = roi_feats.shape
        # ---- cls branch ----
        x = roi_feats.reshape(n, -1)
        for i in range(max(self.num_cls_fcs, 1)):
            x = nn.relu(nn.Dense(self.cls_out_channels,
                                 name=f"cls_fc{i}")(x))
        cls = nn.Dense(self.num_classes + 1, kernel_init=normal_init(0.01),
                       name="fc_cls")(x)

        # ---- side-aware reg branch ----
        r = roi_feats
        for i in range(2):
            r = nn.relu(nn.Conv(c, (3, 3), padding=1,
                                name=f"reg_pre_conv{i}")(r))
        att_x = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding=1,
                                       kernel_init=normal_init(0.01),
                                       name="reg_conv_att_x")(r))
        att_y = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding=1,
                                       kernel_init=normal_init(0.01),
                                       name="reg_conv_att_y")(r))
        att_x = att_x / jnp.maximum(att_x.sum(axis=1, keepdims=True), 1e-6)
        att_y = att_y / jnp.maximum(att_y.sum(axis=2, keepdims=True), 1e-6)
        fx = (r * att_x).sum(axis=1)                     # (N, W, C)
        fy = (r * att_y).sum(axis=2)                     # (N, H, C)
        # 1-D post conv + 2x upsample to 2*side_num positions
        fx = nn.relu(nn.Conv(c, (3,), padding=1, name="reg_post_x")(fx))
        fy = nn.relu(nn.Conv(c, (3,), padding=1, name="reg_post_y")(fy))
        if self.reg_feat_up_ratio > 1:
            u = self.reg_feat_up_ratio
            fx = nn.relu(nn.ConvTranspose(c, (u,), strides=(u,),
                                          name="upsample_x")(fx))
            fy = nn.relu(nn.ConvTranspose(c, (u,), strides=(u,),
                                          name="upsample_y")(fy))

        def side_pred(f, tag):
            # f (N, 2*side, C): per-position bucket cls + offset
            h1 = f
            for i in range(self.num_reg_fcs):
                h1 = nn.relu(nn.Dense(self.reg_cls_out_channels,
                                      name=f"{tag}_cls_fc{i}")(h1))
            h1 = nn.relu(nn.Dense(self.reg_cls_out_channels,
                                  name=f"{tag}_cls_hidden")(h1))
            bc = nn.Dense(1, kernel_init=normal_init(0.01),
                          name=f"{tag}_fc_cls")(h1)[..., 0]
            h2 = nn.relu(nn.Dense(self.reg_offset_out_channels,
                                  name=f"{tag}_off_hidden")(f))
            bo = nn.Dense(1, kernel_init=normal_init(0.001),
                          name=f"{tag}_fc_off")(h2)[..., 0]
            return bc, bo                                 # (N, 2*side)

        bcx, box_ = side_pred(fx, "x")                    # left|right
        bcy, boy = side_pred(fy, "y")                     # top|down
        sn = self.side_num
        # [l, r, t, d] layout; the right/down halves index outward from the
        # box edge, matching the coder's bucket order
        bucket_cls = jnp.concatenate(
            [bcx[:, :sn], bcx[:, sn:][:, ::-1],
             bcy[:, :sn], bcy[:, sn:][:, ::-1]], axis=-1)
        bucket_off = jnp.concatenate(
            [box_[:, :sn], box_[:, sn:][:, ::-1],
             boy[:, :sn], boy[:, sn:][:, ::-1]], axis=-1)
        return cls, (bucket_cls, bucket_off)


def sabl_roi_loss(bbox_head: SABLHead, cls_logits, bucket_preds, samples,
                  batch, num_samples: int):
    """RoI losses for the SABL head (CE cls + bucket cls/offset)."""
    nc = bbox_head.num_classes
    sn = bbox_head.side_num
    rois = samples["rois"]
    labels = samples["labels"].reshape(-1)
    valid = samples["valid"].reshape(-1).astype(jnp.float32)
    pos = samples["is_pos"].reshape(-1).astype(jnp.float32)
    num_valid = jnp.maximum(valid.sum(), 1.0)
    num_pos = jnp.maximum(pos.sum(), 1.0)
    loss_cls = L.cross_entropy(cls_logits, labels, weight=valid,
                               avg_factor=num_valid)
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(samples["assigned"], 0)[..., None],
        axis=1).reshape(-1, 4)
    offsets, ow, blabels, cw = bbox2bucket(
        rois.reshape(-1, 4), gt, bbox_head.num_buckets,
        bbox_head.scale_factor, bbox_head.offset_topk,
        bbox_head.offset_upperbound, bbox_head.cls_ignore_neighbor)
    bcls, boff = bucket_preds
    loss_bucket_cls = L.binary_cross_entropy(
        bcls, blabels, weight=cw * pos[:, None], reduction="mean",
        avg_factor=num_pos * 4 * sn)
    loss_bucket_off = L.smooth_l1_loss(
        boff, offsets, beta=0.1, weight=ow * pos[:, None], reduction="mean",
        avg_factor=num_pos * 4 * bbox_head.offset_topk)
    return dict(loss_cls=loss_cls, loss_bbox_cls=loss_bucket_cls,
                loss_bbox_reg=loss_bucket_off)


def sabl_roi_predict(bbox_head: SABLHead, cls_logits, bucket_preds,
                     proposals, prop_valid, img_shapes=None,
                     scale_factors=None, score_thr=0.05, iou_threshold=0.5,
                     max_per_img=100):
    nc = bbox_head.num_classes
    b, p = proposals.shape[:2]
    scores = jax.nn.softmax(cls_logits, -1)[:, :nc].reshape(b, p, nc)
    bcls, boff = bucket_preds
    boxes, conf = bucket2bbox(proposals.reshape(-1, 4), bcls, boff,
                              bbox_head.num_buckets,
                              bbox_head.scale_factor)
    scores = scores * conf.reshape(b, p, 1)              # guided rescoring
    boxes = boxes.reshape(b, p, 4)
    if img_shapes is not None:
        xlim = img_shapes[:, None, 1:2]
        ylim = img_shapes[:, None, 0:1]
        boxes = jnp.concatenate(
            [jnp.clip(boxes[..., 0:1], 0, xlim),
             jnp.clip(boxes[..., 1:2], 0, ylim),
             jnp.clip(boxes[..., 2:3], 0, xlim),
             jnp.clip(boxes[..., 3:4], 0, ylim)], axis=-1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc, vd):
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img, valid=vd)

    return jax.vmap(_single)(boxes, scores, prop_valid)
