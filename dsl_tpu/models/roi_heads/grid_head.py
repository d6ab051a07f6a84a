"""Grid R-CNN grid head: grid-point heatmaps replace bbox regression.

Parity with ``/root/reference/mmdet/models/roi_heads/mask_heads/grid_head.py:
11-362`` (conv stack with stride-2 entry, first/second-order fusion between
neighboring grid points via depthwise-5x5+1x1 transitions, grouped deconvs
to per-point heatmaps, Grid-R-CNN-Plus half-sized sub-region targets,
boundary voting decode) and ``grid_roi_head.py:9-169`` (positive-roi jitter,
grid branch on sampled positives, grid refine at test).

TPU redesign: targets are a pure broadcast over (N, 9, h, w) — the
reference's per-roi per-point python circle fill becomes one masked
comparison; decode is vectorized argmax + weighted boundary voting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.models.layers import normal_init


def _sub_regions(grid_points: int, whole: int):
    """Grid-R-CNN-Plus sub-regions (reference ``calc_sub_regions``
    :192-221)."""
    gs = int(grid_points ** 0.5)
    half = whole // 4 * 2
    out = []
    for i in range(grid_points):
        xi, yi = i // gs, i % gs
        if xi == 0:
            sx = 0
        elif xi == gs - 1:
            sx = half
        else:
            sx = max(int((xi / (gs - 1) - 0.25) * whole), 0)
        if yi == 0:
            sy = 0
        elif yi == gs - 1:
            sy = half
        else:
            sy = max(int((yi / (gs - 1) - 0.25) * whole), 0)
        out.append((sx, sy))
    return out, half


class _Trans(nn.Module):
    """Depthwise 5x5 + 1x1 transition (reference :127-148)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (5, 5), padding=2,
                    feature_group_count=self.channels, name="dw")(x)
        return nn.Conv(self.channels, (1, 1), name="pw")(x)


@HEADS.register
class GridHead(nn.Module):
    grid_points: int = 9
    num_convs: int = 8
    roi_size: int = 14           # roi_feat_size
    in_channels: int = 256
    point_feat_channels: int = 64
    loss_weight: float = 15.0
    pos_radius: int = 1

    @property
    def grid_size(self):
        return int(self.grid_points ** 0.5)

    @property
    def whole_map_size(self):
        return self.roi_size * 4

    def neighbors(self):
        gs = self.grid_size
        out = []
        for i in range(gs):
            for j in range(gs):
                n = []
                if i > 0:
                    n.append((i - 1) * gs + j)
                if j > 0:
                    n.append(i * gs + j - 1)
                if j < gs - 1:
                    n.append(i * gs + j + 1)
                if i < gs - 1:
                    n.append((i + 1) * gs + j)
                out.append(tuple(n))
        return out

    @nn.compact
    def __call__(self, x, training: bool = False):
        gp = self.grid_points
        c = self.point_feat_channels
        cout = c * gp
        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            x = nn.Conv(cout, (3, 3), strides=(stride, stride), padding=1,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=gp, name=f"gn{i}")(x)
            x = nn.relu(x)

        neighbors = self.neighbors()
        # first-order fusion
        pts = [x[..., i * c:(i + 1) * c] for i in range(gp)]
        fo = []
        for i, nbrs in enumerate(neighbors):
            acc = pts[i]
            for j, p in enumerate(nbrs):
                acc = acc + _Trans(c, name=f"fo_{i}_{j}")(pts[p])
            fo.append(acc)
        # second-order fusion
        so = []
        for i, nbrs in enumerate(neighbors):
            acc = pts[i]
            for j, p in enumerate(nbrs):
                acc = acc + _Trans(c, name=f"so_{i}_{j}")(fo[p])
            so.append(acc)

        # the deconv weights are shared between the fused and unfused paths
        # (reference runs the same deconv1/deconv2 on both, :176-188)
        deconv1 = [nn.ConvTranspose(c, (4, 4), strides=(2, 2),
                                    padding="SAME", name=f"deconv1_{i}")
                   for i in range(gp)]
        dgn = [nn.GroupNorm(num_groups=1, name=f"dgn_{i}")
               for i in range(gp)]
        # heatmap prior bias: -log(0.99/0.01) (reference init :38)
        deconv2 = [nn.ConvTranspose(
            1, (4, 4), strides=(2, 2), padding="SAME",
            kernel_init=normal_init(0.001),
            bias_init=nn.initializers.constant(-4.595),
            name=f"deconv2_{i}") for i in range(gp)]

        def deconv_stack(feats):
            outs = []
            for i, f in enumerate(feats):
                y = nn.relu(dgn[i](deconv1[i](f)))
                outs.append(deconv2[i](y))
            return jnp.concatenate(outs, axis=-1)       # (N, h, h, gp)

        fused = deconv_stack(so)
        unfused = deconv_stack(pts)
        return dict(fused=fused, unfused=unfused)


def grid_targets(head: GridHead, pos_rois, gt_boxes, valid):
    """Sub-region grid-point heatmap targets (reference ``get_targets``
    :223-289), fully vectorized: (N, half, half, grid_points)."""
    gp = head.grid_points
    gs = head.grid_size
    whole = head.whole_map_size
    subs, half = _sub_regions(gp, whole)
    # expand rois 2x
    w = pos_rois[:, 2] - pos_rois[:, 0]
    h = pos_rois[:, 3] - pos_rois[:, 1]
    ex1 = pos_rois[:, 0] - w / 2
    ey1 = pos_rois[:, 1] - h / 2
    ew = 2 * w
    eh = 2 * h
    ok = (ew > gs) & (eh > gs) & (valid > 0)

    fx = jnp.asarray([1 - (j // gs) / (gs - 1) for j in range(gp)])
    fy = jnp.asarray([1 - (j % gs) / (gs - 1) for j in range(gp)])
    gx = fx[None, :] * gt_boxes[:, 0:1] + (1 - fx)[None, :] * gt_boxes[:, 2:3]
    gy = fy[None, :] * gt_boxes[:, 1:2] + (1 - fy)[None, :] * gt_boxes[:, 3:4]
    cx = ((gx - ex1[:, None]) / jnp.maximum(ew, 1e-6)[:, None]
          * whole).astype(jnp.int32)
    cy = ((gy - ey1[:, None]) / jnp.maximum(eh, 1e-6)[:, None]
          * whole).astype(jnp.int32)

    sub_x = jnp.asarray([s[0] for s in subs])
    sub_y = jnp.asarray([s[1] for s in subs])
    xs = jnp.arange(half)[None, None, None, :] + sub_x[None, :, None, None]
    ys = jnp.arange(half)[None, None, :, None] + sub_y[None, :, None, None]
    d2 = ((xs - cx[:, :, None, None]) ** 2
          + (ys - cy[:, :, None, None]) ** 2)
    t = (d2 <= head.pos_radius ** 2).astype(jnp.float32)
    t = t * ok[:, None, None, None]
    return jnp.moveaxis(t, 1, -1)                        # (N, half, half, gp)


def grid_loss(head: GridHead, grid_pred: dict, targets, valid):
    """BCE x loss_weight on fused + unfused heatmaps (reference ``loss``
    :291-295), averaged over the valid rois' elements."""
    w = valid[:, None, None, None]
    n_el = jnp.maximum(jnp.sum(w) * targets.shape[1] * targets.shape[2]
                       * targets.shape[3], 1.0)

    def bce(logits):
        p = jax.nn.log_sigmoid(logits)
        q = jax.nn.log_sigmoid(-logits)
        return jnp.sum((-targets * p - (1 - targets) * q) * w) / n_el

    return head.loss_weight * (bce(grid_pred["fused"])
                               + bce(grid_pred["unfused"]))


def grid_decode(head: GridHead, det_boxes, heatmaps, img_shapes=None):
    """Boundary-voting decode (reference ``get_bboxes`` :297-362).

    det_boxes (N, 4) input-frame boxes, heatmaps (N, half, half, gp) logits
    → refined (N, 4)."""
    gp = head.grid_points
    gs = head.grid_size
    whole = head.whole_map_size
    subs, half = _sub_regions(gp, whole)
    n = det_boxes.shape[0]
    probs = jax.nn.sigmoid(heatmaps)                     # (N, h, h, gp)
    flat = jnp.moveaxis(probs, -1, 1).reshape(n, gp, -1)
    scores = jnp.max(flat, axis=-1)                      # (N, gp)
    pos = jnp.argmax(flat, axis=-1)
    xs = pos % half + jnp.asarray([s[0] for s in subs])[None, :]
    ys = pos // half + jnp.asarray([s[1] for s in subs])[None, :]

    w = (det_boxes[:, 2] - det_boxes[:, 0])[:, None]
    h = (det_boxes[:, 3] - det_boxes[:, 1])[:, None]
    x1 = det_boxes[:, 0][:, None] - w / 2
    y1 = det_boxes[:, 1][:, None] - h / 2
    abs_x = (xs + 0.5) / half * w + x1
    abs_y = (ys + 0.5) / half * h + y1

    x1_idx = [i for i in range(gs)]
    y1_idx = [i * gs for i in range(gs)]
    x2_idx = [gp - gs + i for i in range(gs)]
    y2_idx = [(i + 1) * gs - 1 for i in range(gs)]

    def vote(vals, sc, idx):
        idx = jnp.asarray(idx)
        v = vals[:, idx]
        s = sc[:, idx]
        return (v * s).sum(-1) / jnp.maximum(s.sum(-1), 1e-6)

    bx1 = vote(abs_x, scores, x1_idx)
    by1 = vote(abs_y, scores, y1_idx)
    bx2 = vote(abs_x, scores, x2_idx)
    by2 = vote(abs_y, scores, y2_idx)
    out = jnp.stack([bx1, by1, bx2, by2], axis=-1)
    if img_shapes is not None:
        lim = jnp.stack([img_shapes[1], img_shapes[0],
                         img_shapes[1], img_shapes[0]])
        out = jnp.clip(out, 0.0, lim[None, :])
    return out
