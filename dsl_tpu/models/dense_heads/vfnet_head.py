"""VarifocalNet (VFNet) head.

Parity with ``/root/reference/mmdet/models/dense_heads/vfnet_head.py:1-767``:
FCOS-style towers; an initial (l, t, r, b) prediction, a star-shaped
deformable refinement whose 9 sampling offsets are derived from the initial
box (``star_dcn_offset`` :273-312, reproduced exactly — including the
``gradient_mul`` partial detach), a refined prediction that multiplies the
detached initial one, and an IoU-aware classification score trained with
Varifocal loss against the refined boxes' IoU. Assignment is ATSS on square
per-point anchors (the reference's default train_cfg).

TPU notes: the star deformable conv is the gather-based
``ops/deform_conv.py``; everything is dense masked math on K-padded GT.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.assigners import atss_assign
from dsl_tpu.core.boxes import bbox_overlaps, distance2bbox
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.core.points import MlvlPointGenerator
from dsl_tpu.models.layers import Scale, bias_init_with_prob, normal_init

# star tap layout (dy, dx) per 3x3 tap, row-major — reference :296-309
# taps:   0:TL    1:T    2:TR   3:L    4:C    5:R    6:BL   7:B    8:BR


def star_dcn_offset(bbox_pred, gradient_mul: float, stride: float):
    """(B, H, W, 4) l,t,r,b -> (B, H, W, 18) DCN offsets (minus base grid)."""
    p = (1 - gradient_mul) * jax.lax.stop_gradient(bbox_pred) \
        + gradient_mul * bbox_pred
    p = p / stride
    l, t, r, b = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    z = jnp.zeros_like(l)
    # (dy, dx) per tap at the star points
    star = [(-t, -l), (-t, z), (-t, r),
            (z, -l), (z, z), (z, r),
            (b, -l), (b, z), (b, r)]
    base = [(-1.0, -1.0), (-1.0, 0.0), (-1.0, 1.0),
            (0.0, -1.0), (0.0, 0.0), (0.0, 1.0),
            (1.0, -1.0), (1.0, 0.0), (1.0, 1.0)]
    chans = []
    for (dy, dx), (by, bx) in zip(star, base):
        chans.append(dy - by)
        chans.append(dx - bx)
    return jnp.stack(chans, axis=-1)


@HEADS.register
class VFNetHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 3
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    gradient_mul: float = 0.1
    anchor_scale: float = 8.0
    atss_topk: int = 9
    loss_bbox_weight: float = 1.5
    loss_bbox_refine_weight: float = 2.0
    dcn_on_last_conv: bool = False   # DCNv2 on the towers' last conv
    # (``anchor_free_head.py _init_cls_convs``; vfnet *mdconv* configs)
    # mmdet-style loss dicts (reference vfnet config :37-45: VarifocalLoss
    # w1, GIoULoss w1.5 / refine w2.0) — when set, they override the scalar
    # weight fields above; unsupported types raise in vfnet_loss.
    loss_cls: dict | None = None
    loss_bbox: dict | None = None
    loss_bbox_refine: dict | None = None

    def make_anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=list(self.strides), ratios=(1.0,),
                               scales=(self.anchor_scale,),
                               center_offset=0.0)

    @nn.compact
    def __call__(self, feats, training: bool = False):
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)

        def _tower_conv(i, prefix):
            """Last stacked conv becomes DCNv2 when dcn_on_last_conv (same
            construction as fcos_head.py — modules hoisted out of the
            level loop for cross-level weight sharing)."""
            if self.dcn_on_last_conv and i == self.stacked_convs - 1:
                from dsl_tpu.ops.deform_conv import deform_conv2d
                name = f"{prefix}_conv{i}"
                offset_conv = nn.Conv(27, (3, 3), padding=((1, 1), (1, 1)),
                                      kernel_init=nn.initializers.zeros,
                                      bias_init=nn.initializers.zeros,
                                      name=f"{name}_offset")
                weight = self.param(f"{name}_kernel", normal_init(0.01),
                                    (3, 3, self.feat_channels,
                                     self.feat_channels))
                bias = self.param(f"{name}_bias", nn.initializers.zeros,
                                  (self.feat_channels,))

                def dcn(x):
                    om = offset_conv(x)
                    return deform_conv2d(x, om[..., :18], weight, bias=bias,
                                         mask=jax.nn.sigmoid(om[..., 18:]))
                return dcn
            return nn.Conv(self.feat_channels, (3, 3), padding=1,
                           kernel_init=normal_init(0.01),
                           name=f"{prefix}_conv{i}")

        cls_convs = [
            (_tower_conv(i, "cls"),
             gn(f"cls_gn{i}")) for i in range(self.stacked_convs)]
        reg_convs = [
            (_tower_conv(i, "reg"),
             gn(f"reg_gn{i}")) for i in range(self.stacked_convs)]
        reg_conv_init = nn.Conv(self.feat_channels, (3, 3), padding=1,
                                kernel_init=normal_init(0.01),
                                name="vfnet_reg_conv")
        reg_conv_init_gn = gn("vfnet_reg_conv_gn")
        vfnet_reg = nn.Conv(4, (3, 3), padding=1,
                            kernel_init=normal_init(0.01), name="vfnet_reg")
        vfnet_reg_refine = nn.Conv(4, (3, 3), padding=1,
                                   kernel_init=normal_init(0.01),
                                   name="vfnet_reg_refine")
        vfnet_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                            kernel_init=normal_init(0.01),
                            bias_init=bias_init_with_prob(0.01),
                            name="vfnet_cls")
        refine_dconv_w = self.param(
            "reg_refine_dconv_kernel", nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.feat_channels))
        cls_dconv_w = self.param(
            "cls_dconv_kernel", nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.feat_channels))
        scales = [Scale(name=f"scale{i}") for i in range(len(self.strides))]
        scales_r = [Scale(name=f"scale_refine{i}")
                    for i in range(len(self.strides))]

        from dsl_tpu.ops.deform_conv import deform_conv2d

        cls_out, bbox_out, refine_out = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for conv, norm in cls_convs:
                cls_feat = nn.relu(norm(conv(cls_feat)))
            for conv, norm in reg_convs:
                reg_feat = nn.relu(norm(conv(reg_feat)))
            reg_init = nn.relu(reg_conv_init_gn(reg_conv_init(reg_feat)))
            stride = float(self.strides[lvl])
            bbox_pred = jnp.exp(scales[lvl](vfnet_reg(reg_init))) * stride
            offsets = star_dcn_offset(bbox_pred, self.gradient_mul, stride)
            reg_ref = nn.relu(deform_conv2d(reg_feat, offsets,
                                            refine_dconv_w))
            bbox_ref = jnp.exp(scales_r[lvl](vfnet_reg_refine(reg_ref))) \
                * jax.lax.stop_gradient(bbox_pred)
            cls_star = nn.relu(deform_conv2d(cls_feat, offsets, cls_dconv_w))
            cls_out.append(vfnet_cls(cls_star))
            bbox_out.append(bbox_pred)
            refine_out.append(bbox_ref)
        return tuple(cls_out), tuple(bbox_out), tuple(refine_out)


def vfnet_loss(head: VFNetHead, cls_scores, bbox_preds, bbox_refines, batch,
               axis_name: str | None = None):
    nc = head.num_classes
    gen = head.make_anchor_generator()
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = gen.flat_anchors(shapes)
    npl = gen.num_anchors(shapes)
    labels, assigned, _, _ = atss_assign(
        anchors, npl, batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], topk=head.atss_topk, num_classes=nc)

    # reference vfnet: anchor_generator center_offset=0.0 and points at
    # grid*stride + stride*center_offset (vfnet_head.py:93-99,596-614) —
    # NOT the fcos stride//2 offset (torch-oracle pinned)
    pgen = MlvlPointGenerator(list(head.strides), offset=0.0)
    pts = jnp.asarray(pgen.flat_points(shapes))

    b = labels.shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    flat_ini = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1)
    flat_ref = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_refines], axis=1)

    pos = (labels < nc).astype(jnp.float32)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    num_pos = jnp.maximum(_psum(pos.sum()), 1.0)
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)

    dec_ini = distance2bbox(pts[None], flat_ini)
    dec_ref = distance2bbox(pts[None], flat_ref)
    iou_ini = jax.lax.stop_gradient(jax.vmap(
        lambda d, g: bbox_overlaps(d, g, is_aligned=True))(dec_ini, gt)) * pos
    iou_ref = jax.lax.stop_gradient(jax.vmap(
        lambda d, g: bbox_overlaps(d, g, is_aligned=True))(dec_ref, gt)) * pos

    cls_cfg = dict(head.loss_cls or {})
    if cls_cfg.get("type", "VarifocalLoss") != "VarifocalLoss":
        raise NotImplementedError(
            f"VFNet loss_cls {cls_cfg.get('type')!r} unsupported")
    bbox_cfg = dict(head.loss_bbox or {})
    refine_cfg = dict(head.loss_bbox_refine or {})
    for c in (bbox_cfg, refine_cfg):
        if c.get("type", "GIoULoss") != "GIoULoss":
            raise NotImplementedError(
                f"VFNet loss_bbox {c.get('type')!r} unsupported")
    bbox_lw = float(bbox_cfg.get("loss_weight", head.loss_bbox_weight))
    refine_lw = float(refine_cfg.get("loss_weight",
                                     head.loss_bbox_refine_weight))

    denom_ini = jnp.maximum(_psum(iou_ini.sum()), 1e-6)
    denom_ref = jnp.maximum(_psum(iou_ref.sum()), 1e-6)
    loss_bbox = bbox_lw * L.giou_loss(
        dec_ini, gt, weight=iou_ini, avg_factor=denom_ini)
    loss_bbox_rf = refine_lw * L.giou_loss(
        dec_ref, gt, weight=iou_ref, avg_factor=denom_ref)

    # IoU-aware cls targets: refined IoU at the assigned class (ref :lossvfl)
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, nc - 1), nc)
    cls_t = onehot * iou_ref[..., None] * pos[..., None]
    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * L.varifocal_loss(
        flat_cls, cls_t, avg_factor=num_pos)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_bbox_rf=loss_bbox_rf)


def vfnet_get_bboxes(head: VFNetHead, cls_scores, bbox_preds, bbox_refines,
                     img_shapes=None, scale_factors=None, nms_pre=1000,
                     score_thr=0.05, iou_threshold=0.6, max_per_img=100):
    """Decode the REFINED boxes; scores are the iou-aware sigmoid(cls)
    (reference ``get_bboxes``)."""
    nc = head.num_classes
    b = cls_scores[0].shape[0]
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    pgen = MlvlPointGenerator(list(head.strides), offset=0.0)
    lvl_pts = pgen.grid_points(shapes)

    boxes_all, scores_all = [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.sigmoid(cls_scores[lvl].reshape(b, -1, nc))
        pred = bbox_refines[lvl].reshape(b, -1, 4)
        pts = jnp.asarray(lvl_pts[lvl])[None].repeat(b, axis=0)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, idx = jax.lax.top_k(rank, k)
        take = lambda a: jnp.take_along_axis(
            a, idx.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
        scores, pred, pts = take(scores), take(pred), take(pts)
        box = distance2bbox(pts, pred)
        if img_shapes is not None:
            xlim = img_shapes[:, None, 1:2]
            ylim = img_shapes[:, None, 0:1]
            box = jnp.concatenate(
                [jnp.clip(box[..., 0:1], 0, xlim),
                 jnp.clip(box[..., 1:2], 0, ylim),
                 jnp.clip(box[..., 2:3], 0, xlim),
                 jnp.clip(box[..., 3:4], 0, ylim)], axis=-1)
        boxes_all.append(box)
        scores_all.append(scores)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc):
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img)

    return jax.vmap(_single)(boxes, scores)
