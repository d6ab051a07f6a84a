"""RepPoints head (point-set object representation).

Parity with ``/root/reference/mmdet/models/dense_heads/reppoints_head.py``:
two stages of 9-point offset fields — init points assigned by the
PointAssigner (each GT claims the nearest point at its scale-matched level,
``core/bbox/assigners/point_assigner.py``), refine points (DCN conditioned
on the init points, exactly ``pts_out_init_grad_mul - dcn_base_offset``)
assigned by MaxIoU on the init-decoded boxes; the ``moment`` points→bbox
transform with its learnable ``moment_transfer`` (mul 0.01); focal cls +
stride-normalized smooth-L1 (β 0.11) with weights 0.5 (init) / 1.0 (refine).

TPU redesign: dense masked assignment over K-padded GT (a lax.scan resolves
nearest-point conflicts), gather-based deformable conv.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.assigners import _max_iou_assign_single
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.core.points import MlvlPointGenerator
from dsl_tpu.models.layers import bias_init_with_prob, normal_init
from dsl_tpu.ops.deform_conv import deform_conv2d

# 3x3 base grid, (dy, dx) tap-major — the mmcv dcn_base_offset layout
_BASE = jnp.asarray([(-1., -1.), (-1., 0.), (-1., 1.),
                     (0., -1.), (0., 0.), (0., 1.),
                     (1., -1.), (1., 0.), (1., 1.)]).reshape(-1)


@HEADS.register
class RepPointsHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    gradient_mul: float = 0.1
    point_base_scale: int = 4
    moment_mul: float = 0.01
    transform_method: str = "moment"
    use_grid_points: bool = False   # 'bbox' representation: both stages
    # regress a box and the 9 points are a regular grid on it
    # (``reppoints_head.py gen_grid_from_reg:219-251``)
    # mmdet-style loss dicts (reference reppoints config :35-42: FocalLoss
    # w1, SmoothL1 beta.11 w.5 init / w1 refine); unsupported types raise.
    loss_cls: dict | None = None
    loss_bbox_init: dict | None = None
    loss_bbox_refine: dict | None = None

    @nn.compact
    def __call__(self, feats, training: bool = False):
        """Per level: (cls_out, pts_init (B,H,W,2n), pts_refine) + the
        moment_transfer param."""
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)
        cls_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1,
                     kernel_init=normal_init(0.01), name=f"cls_conv{i}"),
             gn(f"cls_gn{i}")) for i in range(self.stacked_convs)]
        reg_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1,
                     kernel_init=normal_init(0.01), name=f"reg_conv{i}"),
             gn(f"reg_gn{i}")) for i in range(self.stacked_convs)]
        n2 = 2 * self.num_points
        out_dim = 4 if self.use_grid_points else n2
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3), padding=1,
                                kernel_init=normal_init(0.01),
                                name="pts_init_conv")
        pts_init_out = nn.Conv(out_dim, (1, 1),
                               kernel_init=normal_init(0.01),
                               name="pts_init_out")
        cls_dconv_w = self.param("cls_dconv_kernel",
                                 nn.initializers.he_normal(),
                                 (3, 3, self.feat_channels,
                                  self.point_feat_channels))
        cls_out_conv = nn.Conv(self.num_classes, (1, 1),
                               kernel_init=normal_init(0.01),
                               bias_init=bias_init_with_prob(0.01),
                               name="cls_out")
        refine_dconv_w = self.param("refine_dconv_kernel",
                                    nn.initializers.he_normal(),
                                    (3, 3, self.feat_channels,
                                     self.point_feat_channels))
        pts_refine_out = nn.Conv(out_dim, (1, 1),
                                 kernel_init=normal_init(0.01),
                                 name="pts_refine_out")
        moment = self.param("moment_transfer", nn.initializers.zeros, (2,))

        cls_all, init_all, refine_all = [], [], []
        for x in feats:
            cls_feat, pts_feat = x, x
            for conv, norm in cls_convs:
                cls_feat = nn.relu(norm(conv(cls_feat)))
            for conv, norm in reg_convs:
                pts_feat = nn.relu(norm(conv(pts_feat)))
            raw_init = pts_init_out(nn.relu(pts_init_conv(pts_feat)))
            if self.use_grid_points:
                s = self.point_base_scale / 2.0
                prev = jnp.broadcast_to(
                    jnp.asarray([-s, -s, s, s], raw_init.dtype),
                    raw_init.shape)
                pts_init, bbox_init = _grid_from_reg(raw_init, prev)
            else:
                pts_init = raw_init
            blend = (1 - self.gradient_mul) * jax.lax.stop_gradient(pts_init)\
                + self.gradient_mul * pts_init
            dcn_off = blend - _BASE
            cls_all.append(cls_out_conv(
                nn.relu(deform_conv2d(cls_feat, dcn_off, cls_dconv_w))))
            refine = pts_refine_out(
                nn.relu(deform_conv2d(pts_feat, dcn_off, refine_dconv_w)))
            init_all.append(pts_init)
            if self.use_grid_points:
                pts_refine, _ = _grid_from_reg(
                    refine, jax.lax.stop_gradient(bbox_init))
                refine_all.append(pts_refine)
            else:
                refine_all.append(refine + jax.lax.stop_gradient(pts_init))
        return tuple(cls_all), tuple(init_all), tuple(refine_all), moment


def _grid_from_reg(reg: jnp.ndarray, prev: jnp.ndarray):
    """Regress a box from ``prev`` and lay a 3x3 grid of y-first points on
    it (``reppoints_head.py gen_grid_from_reg:219-251``).

    reg/prev: (..., 4); returns (points (..., 18), bbox (..., 4))."""
    bxy = (prev[..., :2] + prev[..., 2:]) * 0.5
    bwh = jnp.clip(prev[..., 2:] - prev[..., :2], 1e-6)
    tl = bxy + bwh * reg[..., :2] - 0.5 * bwh * jnp.exp(reg[..., 2:])
    wh = bwh * jnp.exp(reg[..., 2:])
    iv = jnp.linspace(0.0, 1.0, 3).astype(reg.dtype)
    gx = tl[..., 0:1] + wh[..., 0:1] * iv                      # (..., 3)
    gy = tl[..., 1:2] + wh[..., 1:2] * iv
    lead = reg.shape[:-1]
    yy = jnp.broadcast_to(gy[..., :, None], lead + (3, 3))
    xx = jnp.broadcast_to(gx[..., None, :], lead + (3, 3))
    pts = jnp.stack([yy, xx], axis=-1).reshape(lead + (18,))
    bbox = jnp.concatenate([tl, tl + wh], axis=-1)
    return pts, bbox


def points2bbox(head, pts, moment):
    """(..., 2n) y-first offset fields -> (..., 4) boxes
    (reference ``points2bbox`` :168-218, 'moment' and 'minmax')."""
    shape = pts.shape[:-1]
    p = pts.reshape(*shape, head.num_points, 2)
    py, px = p[..., 0], p[..., 1]
    if head.transform_method == "minmax":
        return jnp.stack([px.min(-1), py.min(-1), px.max(-1), py.max(-1)],
                         axis=-1)
    # moment; std via sqrt(var + eps) — jnp.std has an unbounded gradient at
    # zero spread (all 9 points identical happens at init on dead-ReLU
    # positions) which NaNs the backward pass. torch.std is UNBIASED
    # (n-1 denominator) — the reference uses it, so we must too.
    mx = px.mean(-1)
    my = py.mean(-1)
    n1 = max(head.num_points - 1, 1)
    sx = jnp.sqrt(((px - mx[..., None]) ** 2).sum(-1) / n1 + 1e-9)
    sy = jnp.sqrt(((py - my[..., None]) ** 2).sum(-1) / n1 + 1e-9)
    mt = moment * head.moment_mul + jax.lax.stop_gradient(moment) \
        * (1 - head.moment_mul)
    hw = sx * jnp.exp(mt[0])
    hh = sy * jnp.exp(mt[1])
    return jnp.stack([mx - hw, my - hh, mx + hw, my + hh], axis=-1)


def _point_assign_single(pts, pt_lvls, gt_bboxes, gt_labels, gt_valid,
                         num_classes, scale=4, pos_num=1):
    """PointAssigner (``point_assigner.py:19-134``): each GT claims its
    ``pos_num`` nearest points at its matched level; point conflicts go to
    the closer GT. RepPoints configs use ``pos_num=1``; the reference
    default is 3."""
    k = gt_bboxes.shape[0]
    p = pts.shape[0]
    w = jnp.maximum(gt_bboxes[:, 2] - gt_bboxes[:, 0], 1e-6)
    h = jnp.maximum(gt_bboxes[:, 3] - gt_bboxes[:, 1], 1e-6)
    # .int() truncation, matching the reference (:77-79)
    gt_lvl = jnp.trunc(0.5 * (jnp.log2(w / scale) + jnp.log2(h / scale)))
    gt_lvl = jnp.clip(gt_lvl, pt_lvls.min(), pt_lvls.max())
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    # gt-normalized distance (:100): ((p - center) / gt_wh).norm()
    dist = jnp.sqrt(((pts[:, 0][:, None] - cx[None, :]) / w[None, :]) ** 2
                    + ((pts[:, 1][:, None] - cy[None, :])
                       / h[None, :]) ** 2)                         # (P, K)
    lvl_ok = pt_lvls[:, None] == gt_lvl[None, :]
    dist = jnp.where(lvl_ok & gt_valid[None, :], dist, jnp.inf)
    kk = min(int(pos_num), p)
    neg_d, top_idx = jax.lax.top_k(-dist.T, kk)          # (K, kk)
    top_d = -neg_d

    def body(carry, g):
        assigned, best_d = carry

        def inner(carry2, j):
            assigned2, best_d2 = carry2
            idx = top_idx[g, j]
            d = top_d[g, j]
            ok = gt_valid[g] & jnp.isfinite(d) & (d < best_d2[idx])
            assigned2 = assigned2.at[idx].set(
                jnp.where(ok, g, assigned2[idx]))
            best_d2 = best_d2.at[idx].set(jnp.where(ok, d, best_d2[idx]))
            return (assigned2, best_d2), None

        carry, _ = jax.lax.scan(inner, (assigned, best_d), jnp.arange(kk))
        return carry, None

    init = (jnp.full((p,), -1, jnp.int32), jnp.full((p,), jnp.inf))
    (assigned, _), _ = jax.lax.scan(body, init, jnp.arange(k))
    labels = jnp.where(assigned >= 0,
                       gt_labels[jnp.maximum(assigned, 0)], num_classes)
    return labels.astype(jnp.int32), assigned


def reppoints_loss(head: RepPointsHead, outputs, batch,
                   axis_name: str | None = None):
    cls_scores, pts_inits, pts_refines, moment = outputs
    nc = head.num_classes
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    # RepPoints uses offset-0 points (``MlvlPointGenerator(strides,
    # offset=0.)`` in the reference __init__ :98-99)
    gen = MlvlPointGenerator(list(head.strides), offset=0.0)
    pts = jnp.asarray(gen.flat_points(shapes))                 # (P, 2)
    pt_strides = jnp.concatenate([
        jnp.full((h * w,), float(s))
        for (h, w), s in zip(shapes, head.strides)])
    pt_lvls = jnp.log2(pt_strides)

    b = cls_scores[0].shape[0]
    n2 = 2 * head.num_points
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    flat_init = jnp.concatenate(
        [o.reshape(b, -1, n2) for o in pts_inits], axis=1)
    flat_refine = jnp.concatenate(
        [o.reshape(b, -1, n2) for o in pts_refines], axis=1)

    # decode to image coords: center + offset*stride (offset_to_pts)
    centers = jnp.stack([pts[:, 0], pts[:, 1]], axis=-1)
    yx = jnp.stack([centers[:, 1], centers[:, 0]], axis=-1)    # y-first
    base = jnp.tile(yx, (1, head.num_points))[None]            # (1, P, 2n)
    abs_init = base + flat_init * pt_strides[None, :, None]
    abs_refine = base + flat_refine * pt_strides[None, :, None]
    box_init = points2bbox(head, abs_init, moment)             # (B, P, 4)
    box_refine = points2bbox(head, abs_refine, moment)

    # ---- init stage: PointAssigner ----
    labels_i, assigned_i = jax.vmap(
        lambda gb, gl, gv: _point_assign_single(
            pts, pt_lvls, gb, gl, gv, nc, scale=head.point_base_scale))(
        batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"])
    pos_i = (assigned_i >= 0).astype(jnp.float32)

    # ---- refine stage: MaxIoU on the init boxes ----
    labels_r, assigned_r, _, _ = jax.vmap(
        lambda bx, gb, gl, gv: _max_iou_assign_single(
            bx, gb, gl, gv, pos_iou_thr=0.5, neg_iou_thr=0.4,
            min_pos_iou=0.0, num_classes=nc, match_low_quality=True))(
        jax.lax.stop_gradient(box_init), batch["gt_bboxes"],
        batch["gt_labels"], batch["gt_valid"])
    pos_r = (labels_r < nc).astype(jnp.float32)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    num_pos_i = jnp.maximum(_psum(pos_i.sum()), 1.0)
    num_pos_r = jnp.maximum(_psum(pos_r.sum()), 1.0)

    gt_i = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned_i, 0)[..., None], axis=1)
    gt_r = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned_r, 0)[..., None], axis=1)

    cls_cfg = dict(head.loss_cls or {})
    if cls_cfg.get("type", "FocalLoss") != "FocalLoss":
        raise NotImplementedError(
            f"RepPoints loss_cls {cls_cfg.get('type')!r} unsupported")
    init_cfg = dict(head.loss_bbox_init or {})
    refine_cfg = dict(head.loss_bbox_refine or {})
    for c in (init_cfg, refine_cfg):
        if c.get("type", "SmoothL1Loss") != "SmoothL1Loss":
            raise NotImplementedError(
                f"RepPoints loss_bbox {c.get('type')!r} unsupported")

    # reference loss_single: smooth-L1 elementwise over the (pos, 4) block
    # averaged by num_pos (NOT num_pos*4) — bbox_weights are (N, 4) ones
    norm = (head.point_base_scale * pt_strides)[None, :, None]
    loss_pts_init = float(init_cfg.get("loss_weight", 0.5)) * \
        L.smooth_l1_loss(
            box_init / norm, gt_i / norm,
            beta=float(init_cfg.get("beta", 0.11)),
            weight=pos_i[..., None], avg_factor=num_pos_i)
    loss_pts_refine = float(refine_cfg.get("loss_weight", 1.0)) * \
        L.smooth_l1_loss(
            box_refine / norm, gt_r / norm,
            beta=float(refine_cfg.get("beta", 0.11)),
            weight=pos_r[..., None], avg_factor=num_pos_r)
    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * L.sigmoid_focal_loss(
        flat_cls, labels_r, avg_factor=num_pos_r)
    return dict(loss_cls=loss_cls, loss_pts_init=loss_pts_init,
                loss_pts_refine=loss_pts_refine)


def reppoints_get_bboxes(head: RepPointsHead, outputs, img_shapes=None,
                         scale_factors=None, nms_pre=1000, score_thr=0.05,
                         iou_threshold=0.6, max_per_img=100):
    """Decode the refined point sets into boxes + multiclass NMS."""
    cls_scores, _, pts_refines, moment = outputs
    nc = head.num_classes
    b = cls_scores[0].shape[0]
    shapes = [tuple(c.shape[1:3]) for c in cls_scores]
    gen = MlvlPointGenerator(list(head.strides), offset=0.5)
    lvl_pts = gen.grid_points(shapes)

    boxes_all, scores_all = [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.sigmoid(cls_scores[lvl].reshape(b, -1, nc))
        n2 = 2 * head.num_points
        pred = pts_refines[lvl].reshape(b, -1, n2)
        pts = jnp.asarray(lvl_pts[lvl])
        yx = jnp.stack([pts[:, 1], pts[:, 0]], axis=-1)
        base = jnp.tile(yx, (1, head.num_points))[None]
        absr = base + pred * float(head.strides[lvl])
        box = points2bbox(head, absr, moment)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, idx = jax.lax.top_k(rank, k)
        take = lambda a: jnp.take_along_axis(
            a, idx.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
        scores, box = take(scores), take(box)
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
