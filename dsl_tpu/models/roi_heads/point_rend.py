"""PointRend: coarse mask head + uncertainty-driven point refinement.

Parity with ``/root/reference/mmdet/models/roi_heads/mask_heads/
coarse_mask_head.py:10-99`` (conv stack + FCs producing a small per-class
mask grid), ``mask_point_head.py:13-305`` (shared point MLP over
fine-grained FPN features concatenated with coarse logits; importance point
sampling with oversample/importance ratios at train, most-uncertain topk at
test) and ``point_rend_roi_head.py:18-260`` (train point loss on positive
rois, iterative subdivision refine at test).

TPU redesign: per-image batched shapes throughout — points are
(B, N, P, 2), fine features come from a vmapped bilinear sample of the P2
map (the reference's configured single-level extractor), point targets are
sampled from the per-GT normalized mask crops, and the test-time scatter
of refined logits is a one-hot masked blend (no dynamic scatter).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.models.dense_heads.yolact_head import _bilinear_1ch
from dsl_tpu.models.layers import normal_init


@HEADS.register
class CoarseMaskHead(nn.Module):
    """(reference ``coarse_mask_head.py``)."""

    num_classes: int = 80
    in_channels: int = 256
    roi_size: int = 14
    num_convs: int = 0
    conv_out_channels: int = 256
    num_fcs: int = 2
    fc_out_channels: int = 1024
    downsample_factor: int = 2

    @property
    def output_size(self) -> int:
        return self.roi_size // self.downsample_factor

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                name=f"conv{i}")(x))
        if self.downsample_factor > 1:
            d = self.downsample_factor
            x = nn.relu(nn.Conv(self.conv_out_channels, (d, d),
                                strides=(d, d), padding=0,
                                name="downsample_conv")(x))
        n = x.shape[0]
        x = x.reshape(n, -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, name=f"fc{i}")(x))
        out = self.output_size
        logits = nn.Dense(self.num_classes * out * out,
                          kernel_init=normal_init(0.001),
                          name="fc_logits")(x)
        return logits.reshape(n, out, out, self.num_classes)


@HEADS.register
class MaskPointHead(nn.Module):
    """(reference ``mask_point_head.py:13-106``)."""

    num_classes: int = 80
    num_fcs: int = 3
    in_channels: int = 256
    fc_channels: int = 256
    coarse_pred_each_layer: bool = True

    @nn.compact
    def __call__(self, fine_feats, coarse_feats):
        """fine (..., P, Cin), coarse (..., P, C) -> logits (..., P, C)."""
        x = jnp.concatenate([fine_feats, coarse_feats], axis=-1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, name=f"fc{i}")(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse_feats], axis=-1)
        return nn.Dense(self.num_classes, kernel_init=normal_init(0.001),
                        name="fc_logits")(x)


def _sample_chw(img, pts):
    """Vectorized bilinear sample of (h, w, C) at (P, 2) normalized."""
    h, w, c = img.shape
    ys = pts[:, 1] * h - 0.5
    xs = pts[:, 0] * w - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[:, None]
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    return (img[y0i, x0i] * (1 - wy) * (1 - wx)
            + img[y0i, x1i] * (1 - wy) * wx
            + img[y1i, x0i] * wy * (1 - wx)
            + img[y1i, x1i] * wy * wx)                   # (P, C)


def uncertain_points_train(key, coarse_logits, labels, num_points: int,
                           oversample_ratio: float = 3.0,
                           importance_ratio: float = 0.75):
    """Importance point sampling (reference ``get_roi_rel_points_train``
    :211-260): oversample random points, keep the most uncertain
    ``importance_ratio`` fraction, fill with random points.

    coarse_logits (N, h, w, C); labels (N,). Returns (N, num_points, 2)."""
    n = coarse_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    pts = jax.random.uniform(key, (n, num_sampled, 2))
    sampled = jax.vmap(_sample_chw)(coarse_logits, pts)   # (N, S, C)
    cls = jnp.clip(labels, 0, coarse_logits.shape[-1] - 1)
    logit = jnp.take_along_axis(sampled, cls[:, None, None], axis=-1)[..., 0]
    uncertainty = -jnp.abs(logit)                          # (N, S)
    n_imp = int(importance_ratio * num_points)
    _, idx = jax.lax.top_k(uncertainty, n_imp)
    imp = jnp.take_along_axis(pts, idx[..., None], axis=1)
    n_rand = num_points - n_imp
    if n_rand > 0:
        rnd = jax.random.uniform(jax.random.fold_in(key, 1), (n, n_rand, 2))
        return jnp.concatenate([imp, rnd], axis=1)
    return imp


def point_targets_from_crops(crops, gt_boxes, rois, rel_points):
    """GT occupancy at roi-relative points, sampled from the per-GT
    normalized mask crops (replaces the reference's full-image
    ``point_sample(gt_masks)``).

    crops (N, M, M) uint8 for each roi's assigned gt; gt_boxes (N, 4);
    rois (N, 4); rel_points (N, P, 2) in [0,1] roi coords."""
    ax = rois[:, 0:1] + rel_points[..., 0] * (rois[:, 2:3] - rois[:, 0:1])
    ay = rois[:, 1:2] + rel_points[..., 1] * (rois[:, 3:4] - rois[:, 1:2])
    gw = jnp.maximum(gt_boxes[:, 2:3] - gt_boxes[:, 0:1], 1e-3)
    gh = jnp.maximum(gt_boxes[:, 3:4] - gt_boxes[:, 1:2], 1e-3)
    nx = (ax - gt_boxes[:, 0:1]) / gw
    ny = (ay - gt_boxes[:, 1:2]) / gh
    inside = (nx >= 0) & (nx <= 1) & (ny >= 0) & (ny <= 1)
    m = crops.shape[-1]

    def one(crop, xs, ys):
        return _bilinear_1ch(crop.astype(jnp.float32), ys * m - 0.5,
                             xs * m - 0.5)

    vals = jax.vmap(one)(crops, nx, ny)
    return jnp.where(inside, vals, 0.0)                    # (N, P)


def fine_grained_point_feats(p2_feats, rois, rel_points, stride: int = 4):
    """Sample the P2 map at roi-relative points (the reference PointRend
    config's single-level [stride-4] extractor).

    p2_feats (B, H, W, C); rois (B, N, 4) input-frame; rel_points
    (B, N, P, 2) -> (B, N, P, C)."""
    h, w = p2_feats.shape[1:3]

    def per_image(feat, boxes, pts):
        ax = boxes[:, 0:1] + pts[..., 0] * (boxes[:, 2:3] - boxes[:, 0:1])
        ay = boxes[:, 1:2] + pts[..., 1] * (boxes[:, 3:4] - boxes[:, 1:2])
        norm = jnp.stack([ax / (w * stride), ay / (h * stride)], axis=-1)
        return jax.vmap(lambda p: _sample_chw(feat, p))(norm)

    return jax.vmap(per_image)(p2_feats, rois, rel_points)


def point_rend_refine(coarse_logits, p2_feats, rois, labels, apply_point_fn,
                      subdivision_steps: int = 2, num_points: int = 196,
                      stride: int = 4):
    """Test-time subdivision (reference ``_mask_point_forward_test``
    :108-156): repeatedly 2x-upsample, find the ``num_points`` most
    uncertain grid cells, re-predict them with the point head, and blend via
    one-hot masks (static-shape scatter).

    coarse_logits (B, N, h, w, C) -> (B, N, h*2^s, w*2^s, C)."""
    b, n = coarse_logits.shape[:2]
    c = coarse_logits.shape[-1]
    refined = coarse_logits
    for _ in range(subdivision_steps):
        bh, bw = refined.shape[2] * 2, refined.shape[3] * 2
        refined = jax.image.resize(refined, (b, n, bh, bw, c), "bilinear")
        cls = jnp.clip(labels, 0, c - 1)
        sel = jnp.take_along_axis(
            refined, cls[..., None, None, None], axis=-1)[..., 0]
        unc = -jnp.abs(sel).reshape(b, n, bh * bw)
        k = min(num_points, bh * bw)
        _, idx = jax.lax.top_k(unc, k)                     # (B, N, k)
        xs = (idx % bw).astype(jnp.float32)
        ys = (idx // bw).astype(jnp.float32)
        pts = jnp.stack([(xs + 0.5) / bw, (ys + 0.5) / bh], axis=-1)
        fine = fine_grained_point_feats(p2_feats, rois, pts, stride=stride)
        coarse_pts = jax.vmap(jax.vmap(_sample_chw))(coarse_logits, pts)
        point_logits = apply_point_fn(fine, coarse_pts)    # (B, N, k, C)
        flat = refined.reshape(b, n, bh * bw, c)
        onehot = jax.nn.one_hot(idx, bh * bw, axis=-1)     # (B, N, k, HW)
        # replace the selected cells with the point predictions
        repl = jnp.einsum("bnkh,bnkc->bnhc", onehot, point_logits)
        keep = 1.0 - jnp.clip(onehot.sum(axis=2), 0, 1)[..., None]
        flat = flat * keep + repl
        refined = flat.reshape(b, n, bh, bw, c)
    return refined
