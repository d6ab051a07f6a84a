"""FoveaBox head.

Parity with ``/root/reference/mmdet/models/dense_heads/fovea_head.py``:
per-level scale ranges assign each GT by sqrt(area); the positive region is
the ``sigma``-shrunk GT box on the feature grid (smaller GTs overwrite
larger where they overlap — the reference's descending-area paint order);
box targets are log((point-to-side distance)/base_edge) clamped to
[1/16, 16], trained with smooth-L1 (β 0.11); focal cls; decode is
``stride·point ∓ base_edge·exp(pred)``.

TPU redesign: dense masked target assignment over the K-padded GT (argmin
area over covering GTs replaces the paint-order loop).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.layers import Scale, bias_init_with_prob, normal_init

INF = 1e8
DEFAULT_RANGES = ((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048))


@HEADS.register
class FoveaHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    base_edge_list: Sequence[int] = (16, 32, 64, 128, 256)
    scale_ranges: Sequence = DEFAULT_RANGES
    sigma: float = 0.4
    with_deform: bool = False     # FeatureAlign (``fovea_head.py:14-45``):
    # cls features deformably aligned by offsets predicted from exp(reg)
    norm_cfg: dict | None = None  # config parity (towers are GN already)
    loss_cls: dict | None = None   # FocalLoss cfg (shipped: γ1.5 α0.4)
    loss_bbox: dict | None = None  # SmoothL1Loss cfg (β0.11)

    @nn.compact
    def __call__(self, feats, training: bool = False):
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)
        cls_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1,
                     kernel_init=normal_init(0.01), name=f"cls_conv{i}"),
             gn(f"cls_gn{i}")) for i in range(self.stacked_convs)]
        reg_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1,
                     kernel_init=normal_init(0.01), name=f"reg_conv{i}"),
             gn(f"reg_gn{i}")) for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                           kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1,
                           kernel_init=normal_init(0.01), name="conv_reg")

        if self.with_deform:
            align_offset = nn.Conv(18, (1, 1), use_bias=False,
                                   kernel_init=nn.initializers.zeros,
                                   name="align_offset")
            align_kernel = self.param(
                "align_kernel", nn.initializers.he_normal(),
                (3, 3, self.feat_channels, self.feat_channels))

        cls_out, reg_out = [], []
        for x in feats:
            cf, rf = x, x
            for conv, norm in cls_convs:
                cf = nn.relu(norm(conv(cf)))
            for conv, norm in reg_convs:
                rf = nn.relu(norm(conv(rf)))
            reg = conv_reg(rf)
            if self.with_deform:
                from dsl_tpu.ops.deform_conv import deform_conv2d

                off = align_offset(jnp.exp(reg))
                cf = nn.relu(deform_conv2d(cf, off, align_kernel))
            cls_out.append(conv_cls(cf))
            reg_out.append(reg)
        return tuple(cls_out), tuple(reg_out)


def _level_targets(head, lvl, hw, gt, labels, valid):
    """Dense per-level fovea targets for one image.

    Returns (labels (H·W,), bbox_t (H·W, 4) log-space, pos (H·W,))."""
    h, w = hw
    stride = float(head.strides[lvl])
    base = float(head.base_edge_list[lvl])
    lo, hi = head.scale_ranges[lvl]
    nc = head.num_classes

    area = jnp.sqrt(jnp.maximum(
        (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1]), 0.0))
    hit = (area >= lo) & (area <= hi) & valid               # (K,)

    gf = gt / stride
    hw_half = 0.5 * (gf[:, 2] - gf[:, 0])
    hh_half = 0.5 * (gf[:, 3] - gf[:, 1])
    px_lo = jnp.clip(jnp.ceil(gf[:, 0] + (1 - head.sigma) * hw_half - 0.5),
                     0, w - 1)
    px_hi = jnp.clip(jnp.floor(gf[:, 0] + (1 + head.sigma) * hw_half - 0.5),
                     0, w - 1)
    py_lo = jnp.clip(jnp.ceil(gf[:, 1] + (1 - head.sigma) * hh_half - 0.5),
                     0, h - 1)
    py_hi = jnp.clip(jnp.floor(gf[:, 1] + (1 + head.sigma) * hh_half - 0.5),
                     0, h - 1)

    ys = jnp.arange(h)[:, None, None]                      # (H, 1, 1)
    xs = jnp.arange(w)[None, :, None]                      # (1, W, 1)
    inside = ((xs >= px_lo) & (xs <= px_hi) & (ys >= py_lo) & (ys <= py_hi)
              & hit[None, None, :])                        # (H, W, K)

    # smaller GTs overwrite larger (paint order): pick min-area covering gt
    pick_area = jnp.where(inside, area[None, None, :], INF)
    gi = jnp.argmin(pick_area, axis=-1)                    # (H, W)
    pos = inside.any(axis=-1)
    lab = jnp.where(pos, labels[gi], nc).reshape(-1)

    ptx = (xs[..., 0] + 0.5) * stride                      # (1, W)
    pty = (ys[..., 0] + 0.5) * stride                      # (H, 1)
    g = gt[gi]                                             # (H, W, 4)
    t = jnp.stack([(ptx - g[..., 0]) / base,
                   (pty - g[..., 1]) / base,
                   (g[..., 2] - ptx) / base,
                   (g[..., 3] - pty) / base], axis=-1)
    t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
    t = jnp.where(pos[..., None], t, 0.0)
    return lab, t.reshape(-1, 4), pos.reshape(-1).astype(jnp.float32)


def fovea_loss(head: FoveaHead, cls_scores, bbox_preds, batch,
               axis_name: str | None = None):
    nc = head.num_classes
    b = cls_scores[0].shape[0]
    labs, tgts, poss, preds_c, preds_r = [], [], [], [], []
    for lvl, (c, r) in enumerate(zip(cls_scores, bbox_preds)):
        hw = c.shape[1:3]
        lab, t, pos = jax.vmap(
            lambda gt, gl, gv: _level_targets(head, lvl, hw, gt, gl, gv))(
            batch["gt_bboxes"], jnp.clip(batch["gt_labels"], 0, nc - 1),
            batch["gt_valid"])
        labs.append(lab)
        tgts.append(t)
        poss.append(pos)
        preds_c.append(c.reshape(b, -1, nc))
        preds_r.append(r.reshape(b, -1, 4))
    labels = jnp.concatenate(labs, axis=1)
    targets = jnp.concatenate(tgts, axis=1)
    pos = jnp.concatenate(poss, axis=1)
    flat_cls = jnp.concatenate(preds_c, axis=1)
    flat_reg = jnp.concatenate(preds_r, axis=1)

    num_pos = pos.sum()
    num_imgs = jnp.asarray(b, jnp.float32)
    if axis_name:
        num_pos = jax.lax.psum(num_pos, axis_name)
        num_imgs = jax.lax.psum(num_imgs, axis_name)
    # reference avg factors (fovea_head.py:146-158): cls by num_pos +
    # num_imgs, bbox by num_pos (elementwise sum over the (pos, 4) block)
    cls_cfg = dict(head.loss_cls or {})
    if cls_cfg.get("type", "FocalLoss") != "FocalLoss":
        raise NotImplementedError(
            f"FoveaHead loss_cls {cls_cfg.get('type')} unsupported")
    bbox_cfg = dict(head.loss_bbox or {})
    if bbox_cfg.get("type", "SmoothL1Loss") != "SmoothL1Loss":
        raise NotImplementedError(
            f"FoveaHead loss_bbox {bbox_cfg.get('type')} unsupported")
    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * L.sigmoid_focal_loss(
        flat_cls, labels, gamma=float(cls_cfg.get("gamma", 2.0)),
        alpha=float(cls_cfg.get("alpha", 0.25)),
        avg_factor=num_pos + num_imgs)
    loss_bbox = float(bbox_cfg.get("loss_weight", 1.0)) * L.smooth_l1_loss(
        flat_reg, targets, beta=float(bbox_cfg.get("beta", 0.11)),
        weight=pos[..., None], avg_factor=num_pos)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def fovea_get_bboxes(head: FoveaHead, cls_scores, bbox_preds,
                     img_shapes=None, scale_factors=None, nms_pre=1000,
                     score_thr=0.05, iou_threshold=0.5, max_per_img=100):
    nc = head.num_classes
    b = cls_scores[0].shape[0]
    boxes_all, scores_all = [], []
    for lvl, (c, r) in enumerate(zip(cls_scores, bbox_preds)):
        h, w = c.shape[1:3]
        stride = float(head.strides[lvl])
        base = float(head.base_edge_list[lvl])
        scores = jax.nn.sigmoid(c.reshape(b, -1, nc))
        pred = jnp.exp(r.reshape(b, -1, 4))
        xs = (jnp.tile(jnp.arange(w)[None, :], (h, 1)).reshape(-1)
              + 0.5) * stride
        ys = (jnp.tile(jnp.arange(h)[:, None], (1, w)).reshape(-1)
              + 0.5) * stride
        x1 = xs[None, :] - base * pred[..., 0]
        y1 = ys[None, :] - base * pred[..., 1]
        x2 = xs[None, :] + base * pred[..., 2]
        y2 = ys[None, :] + base * pred[..., 3]
        box = jnp.stack([x1, y1, x2, y2], axis=-1)
        if img_shapes is not None:
            xlim = img_shapes[:, None, 1:2]
            ylim = img_shapes[:, None, 0:1]
            box = jnp.concatenate(
                [jnp.clip(box[..., 0:1], 0, xlim),
                 jnp.clip(box[..., 1:2], 0, ylim),
                 jnp.clip(box[..., 2:3], 0, xlim),
                 jnp.clip(box[..., 3:4], 0, ylim)], axis=-1)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, idx = jax.lax.top_k(rank, k)
        take = lambda a: jnp.take_along_axis(
            a, idx.reshape(b, k, *(1,) * (a.ndim - 2)), axis=1)
        boxes_all.append(take(box))
        scores_all.append(take(scores))
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc):
        return multiclass_nms(bx, sc, score_thr=score_thr,
                              iou_threshold=iou_threshold,
                              max_per_img=max_per_img)

    return jax.vmap(_single)(boxes, scores)
