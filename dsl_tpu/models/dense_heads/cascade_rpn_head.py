"""Cascade RPN: two-stage anchor refinement for proposals.

Parity with ``/root/reference/mmdet/models/dense_heads/cascade_rpn_head.py:
18-860``: stage 1 runs a dilated "adaptive" conv with a single square
anchor per location, regresses refined anchors under a region assignment
(positives = locations in the center region of each gt at its pyramid
level), stage 2 aligns features to the refined anchors with a deformable
conv whose offsets are computed analytically from the anchor shapes
(``anchor_offset`` :326-404) and predicts objectness + final deltas under
MaxIoU assignment; proposals = stage-2 decode + NMS.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.assigners import _max_iou_assign_single
from dsl_tpu.core.boxes import bbox2delta, bbox_overlaps, delta2bbox
from dsl_tpu.core.nms import nms
from dsl_tpu.models.layers import normal_init
from dsl_tpu.ops.deform_conv import deform_conv2d

STAGE1_STDS = (0.1, 0.1, 0.5, 0.5)
STAGE2_STDS = (0.05, 0.05, 0.1, 0.1)


@HEADS.register
class CascadeRPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_scale: float = 8.0
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    pos_iou_thr: float = 0.7     # stage-2 assigner
    neg_iou_thr: float = 0.7
    anchor_generator: dict | None = None
    num_stages: int = 2
    stages: Sequence | None = None   # config parity

    def make_anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                               scales=[self.anchor_scale])

    @nn.compact
    def __call__(self, feats, training: bool = False):
        """Returns (stage1_regs, stage2_scores, stage2_regs,
        refined_anchors per level)."""
        conv1 = nn.Conv(self.feat_channels, (3, 3), padding=3,
                        kernel_dilation=(3, 3), use_bias=False,
                        kernel_init=normal_init(0.01), name="s1_adapt")
        reg1 = nn.Conv(4, (1, 1), kernel_init=normal_init(0.01),
                       name="s1_reg")
        w2 = self.param("s2_adapt_kernel", normal_init(0.01),
                        (3, 3, self.feat_channels, self.feat_channels))
        cls2 = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                       name="s2_cls")
        reg2 = nn.Conv(4, (1, 1), kernel_init=normal_init(0.01),
                       name="s2_reg")

        gen = self.make_anchor_generator()
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        lvl_anchors = gen.grid_anchors(featmap_sizes)

        s1_regs, s2_scores, s2_regs, refined = [], [], [], []
        for lvl, x in enumerate(feats):
            b, h, w, _ = x.shape
            stride = self.strides[lvl]
            y1 = nn.relu(conv1(x))
            r1 = reg1(y1)                               # (B, H, W, 4)
            anchors = lvl_anchors[lvl][None]            # (1, HW, 4)
            ref = delta2bbox(jnp.broadcast_to(anchors, (b, h * w, 4)),
                             jax.lax.stop_gradient(r1.reshape(b, -1, 4)),
                             (0, 0, 0, 0), STAGE1_STDS)  # (B, HW, 4)
            # analytic DCN offsets from the refined anchors (:340-375)
            acx = (ref[..., 0] + ref[..., 2]) * 0.5 / stride
            acy = (ref[..., 1] + ref[..., 3]) * 0.5 / stride
            gx = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)[None]
            gy = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)[None]
            coff_x = acx - gx
            coff_y = acy - gy
            idx = jnp.asarray([-1.0, 0.0, 1.0])
            yy, xx = jnp.meshgrid(idx, idx, indexing="ij")
            aw = (ref[..., 2] - ref[..., 0]) / stride / 2 - 1
            ah = (ref[..., 3] - ref[..., 1]) / stride / 2 - 1
            soff_x = aw[..., None] * xx.ravel()[None, None]
            soff_y = ah[..., None] * yy.ravel()[None, None]
            off_y = soff_y + coff_y[..., None]          # (B, HW, 9)
            off_x = soff_x + coff_x[..., None]
            offsets = jnp.stack([off_y, off_x], axis=-1).reshape(b, h, w, 18)
            y2 = nn.relu(deform_conv2d(y1, offsets, w2))
            s1_regs.append(r1)
            s2_scores.append(cls2(y2))
            s2_regs.append(reg2(y2))
            refined.append(ref)
        return (tuple(s1_regs), tuple(s2_scores), tuple(s2_regs),
                tuple(refined))


def _region_assign(head, lvl_anchors, featmap_sizes, gt_bboxes, gt_valid):
    """RegionAssigner (``core/bbox/assigners/region_assigner.py:36-221``),
    torch-oracled: per gt IN ORDER at its mapped pyramid level, anchors whose
    centers fall in the ignore region (ratio r2, *rounded* cell bounds
    clamped to [0, size]) are knocked to ignore, then the center region
    (ratio r1) is assigned to this gt — a later gt's ignore region overwrites
    an earlier gt's positives; the adjacent-level ignore maps are applied
    LAST and overwrite everything. Returns (B, A) assigned gt idx
    (-1 = negative/ignore; only positives carry weight downstream)."""
    num_lvls = len(featmap_sizes)
    r1 = (1 - head.center_ratio) / 2
    r2 = (1 - head.ignore_ratio) / 2
    scale = jnp.sqrt(jnp.maximum(
        (gt_bboxes[..., 2] - gt_bboxes[..., 0])
        * (gt_bboxes[..., 3] - gt_bboxes[..., 1]), 1e-6))
    min_size = head.anchor_scale * head.strides[0]
    tgt_lvl = jnp.clip(jnp.floor(
        jnp.log2(scale) - math.log2(min_size) + 0.5), 0, num_lvls - 1)

    assigned_all = []
    for lvl, (h, w) in enumerate(featmap_sizes):
        stride = head.strides[lvl]
        a = lvl_anchors[lvl]
        cx = (a[:, 0] + a[:, 2]) * 0.5 / stride            # (HW,)
        cy = (a[:, 1] + a[:, 3]) * 0.5 / stride

        def region_flags(box, ratio):
            f = box / stride
            x1 = jnp.clip(jnp.round((1 - ratio) * f[0] + ratio * f[2]), 0, w)
            y1 = jnp.clip(jnp.round((1 - ratio) * f[1] + ratio * f[3]), 0, h)
            x2 = jnp.clip(jnp.round(ratio * f[0] + (1 - ratio) * f[2]), 0, w)
            y2 = jnp.clip(jnp.round(ratio * f[1] + (1 - ratio) * f[3]), 0, h)
            return (cx >= x1) & (cx <= x2) & (cy >= y1) & (cy <= y2)

        def per_image(boxes, valid, lvls):
            def body(carry, j):
                assigned, igmap = carry
                at_lvl = (lvls[j] == lvl) & (valid[j] > 0)
                adj = (jnp.abs(lvls[j] - lvl) == 1) & (valid[j] > 0)
                ig = region_flags(boxes[j], r2) & at_lvl
                ps = region_flags(boxes[j], r1) & at_lvl
                assigned = jnp.where(ig, -1, assigned)
                assigned = jnp.where(ps, j, assigned)
                igmap = igmap | (region_flags(boxes[j], r2) & adj)
                return (assigned, igmap), None

            (assigned, igmap), _ = jax.lax.scan(
                body, (jnp.full((h * w,), -1, jnp.int32),
                       jnp.zeros((h * w,), bool)),
                jnp.arange(boxes.shape[0]))
            # default is negative (-1 used for both neg and ignore here:
            # only positives matter for the stage-1 reg loss)
            return jnp.where(igmap, -1, assigned)

        a_img = jax.vmap(per_image)(
            gt_bboxes, gt_valid.astype(jnp.float32), tgt_lvl)
        assigned_all.append(a_img)
    return jnp.concatenate(assigned_all, axis=1)           # (B, A)


def cascade_rpn_loss(head: CascadeRPNHead, outputs, batch, axis_name=None):
    """Two-stage loss, torch-oracled against the reference stages with the
    ``crpn_r50_caffe_fpn_1x_coco.py`` cfg: stage 1 = RegionAssigner + linear
    IoU x10 on the decoded anchors with the GA-style ``total_labels / 200``
    avg factor (``cascade_rpn_head.py:474-480``); stage 2 = MaxIoU(0.7/0.7/
    min_pos 0.3) on the CLIPPED refined anchors (``refine_bboxes`` :530-544
    decodes with ``max_shape=img_shape``), BCE + linear IoU x10 both averaged
    by pos+neg (sampling head)."""
    s1_regs, s2_scores, s2_regs, _ = outputs
    featmap_sizes = [tuple(r.shape[1:3]) for r in s1_regs]
    gen = head.make_anchor_generator()
    lvl_anchors = gen.grid_anchors(featmap_sizes)
    anchors = jnp.concatenate(lvl_anchors, axis=0)
    b = s1_regs[0].shape[0]
    flat_r1 = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in s1_regs], axis=1)
    flat_s2 = jnp.concatenate(
        [s.reshape(b, -1) for s in s2_scores], axis=1)
    flat_r2 = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in s2_regs], axis=1)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    # stage 1: region assignment, linear IoU loss on decoded anchors,
    # avg factor = total label count / 200 (sampling=False stage)
    assigned1 = _region_assign(head, lvl_anchors, featmap_sizes,
                               batch["gt_bboxes"], batch["gt_valid"])
    pos1 = (assigned1 >= 0).astype(jnp.float32)
    n1 = _psum(jnp.asarray(float(b * anchors.shape[0]))) / 200.0
    gt1 = jnp.take_along_axis(batch["gt_bboxes"],
                              jnp.maximum(assigned1, 0)[..., None], axis=1)
    dec1 = delta2bbox(jnp.broadcast_to(anchors[None], flat_r1.shape),
                      flat_r1, (0, 0, 0, 0), STAGE1_STDS)
    ious1 = bbox_overlaps(dec1, gt1, is_aligned=True)
    loss_s1 = 10.0 * jnp.sum((1.0 - ious1) * pos1) / n1

    # refined anchors: stage-1 decode clipped to the image
    # (reference ``refine_bboxes`` passes max_shape=img_shape)
    flat_ref = delta2bbox(jnp.broadcast_to(anchors[None], flat_r1.shape),
                          jax.lax.stop_gradient(flat_r1), (0, 0, 0, 0),
                          STAGE1_STDS)
    if batch.get("img_shapes") is not None:
        hw = batch["img_shapes"]
        xlim = hw[:, None, 1:2]
        ylim = hw[:, None, 0:1]
        flat_ref = jnp.concatenate(
            [jnp.clip(flat_ref[..., 0:1], 0, xlim),
             jnp.clip(flat_ref[..., 1:2], 0, ylim),
             jnp.clip(flat_ref[..., 2:3], 0, xlim),
             jnp.clip(flat_ref[..., 3:4], 0, ylim)], axis=-1)

    # stage 2: MaxIoU on the refined anchors, BCE + linear IoU, both
    # averaged by pos+neg (per-image max(1))
    labels, assigned2, weights, _ = jax.vmap(
        lambda a, gb, gl, gv: _max_iou_assign_single(
            a, gb, gl, gv, pos_iou_thr=head.pos_iou_thr,
            neg_iou_thr=head.neg_iou_thr, min_pos_iou=0.3,
            num_classes=1, match_low_quality=True))(
        flat_ref, batch["gt_bboxes"],
        jnp.zeros_like(batch["gt_labels"]), batch["gt_valid"])
    pos2 = (labels < 1).astype(jnp.float32)
    wpos = (weights > 0) & (labels < 1)
    wneg = (weights > 0) & (labels == 1)
    n2 = _psum(
        jnp.maximum(wpos.astype(jnp.float32).sum(axis=1), 1.0).sum()
        + jnp.maximum(wneg.astype(jnp.float32).sum(axis=1), 1.0).sum())
    loss_cls = L.binary_cross_entropy(flat_s2, pos2, weight=weights,
                                      reduction="mean", avg_factor=n2)
    gt2 = jnp.take_along_axis(batch["gt_bboxes"],
                              jnp.maximum(assigned2, 0)[..., None], axis=1)
    dec2 = delta2bbox(flat_ref, flat_r2, (0, 0, 0, 0), STAGE2_STDS)
    ious2 = bbox_overlaps(dec2, gt2, is_aligned=True)
    loss_reg = 10.0 * jnp.sum((1.0 - ious2) * pos2) / n2
    return dict(loss_rpn_reg_s1=loss_s1, loss_rpn_cls=loss_cls,
                loss_rpn_reg_s2=loss_reg)


def cascade_rpn_proposals(head: CascadeRPNHead, outputs, img_shapes=None,
                          nms_pre: int = 1000, num_proposals: int = 1000,
                          iou_threshold: float = 0.8):
    _, s2_scores, s2_regs, refined = outputs
    b = s2_scores[0].shape[0]
    boxes_all, scores_all = [], []
    for lvl in range(len(s2_scores)):
        scores = jax.nn.sigmoid(s2_scores[lvl].reshape(b, -1))
        reg = s2_regs[lvl].reshape(b, -1, 4)
        ref = refined[lvl]
        k = min(nms_pre, scores.shape[1])
        _, top = jax.lax.top_k(scores, k)
        take = lambda a: jnp.take_along_axis(
            a, top.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
        scores, reg, ref = take(scores), take(reg), take(ref)
        boxes = delta2bbox(ref, reg, (0, 0, 0, 0), STAGE2_STDS)
        if img_shapes is not None:
            xlim = img_shapes[:, None, 1:2]
            ylim = img_shapes[:, None, 0:1]
            boxes = jnp.concatenate(
                [jnp.clip(boxes[..., 0:1], 0, xlim),
                 jnp.clip(boxes[..., 1:2], 0, ylim),
                 jnp.clip(boxes[..., 2:3], 0, xlim),
                 jnp.clip(boxes[..., 3:4], 0, ylim)], axis=-1)
        boxes_all.append(boxes)
        scores_all.append(scores)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)

    def _single(bx, sc):
        dets, idx, valid = nms(bx, sc, iou_threshold=iou_threshold,
                               max_out=num_proposals)
        return dets[:, :4], dets[:, 4], valid

    return jax.vmap(_single)(boxes, scores)
