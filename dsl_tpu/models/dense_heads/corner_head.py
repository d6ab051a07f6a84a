"""CornerNet / CentripetalNet heads.

Parity with ``/root/reference/mmdet/models/dense_heads/corner_head.py:20-1052``
(BiCornerPool, per-level heat/emb/off towers, gaussian corner targets,
GaussianFocal + AssociativeEmbedding + SmoothL1 losses, k x k pair decode)
and ``centripetal_head.py:10-426`` (guiding-shift towers, DCN feature
adaption, centripetal-shift towers and losses, centripetal decode).

TPU redesign: corner targets are generated ON DEVICE from K-padded GT —
``lax.scan`` over GT slots splats the gaussians and scatters the offset /
shift maps (no per-image python); the AE loss gathers predicted embeddings
at the K GT corner pixels instead of building per-image match lists
(``core/losses.py::ae_loss``); decode is a fully batched k x k pair
enumeration with masked sentinels + class-offset batched NMS, all static
shapes under jit. Corner pooling is ``lax.cummax`` (``ops/misc_ops.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.nms import batched_nms
from dsl_tpu.models.dense_heads.centernet_head import gaussian_radius
from dsl_tpu.models.layers import make_norm, normal_init
from dsl_tpu.ops.deform_conv import deform_conv2d
from dsl_tpu.ops.misc_ops import corner_pool


class ConvBN(nn.Module):
    """mmcv ConvModule(conv-bn[-relu]) used inside BiCornerPool."""

    out_channels: int
    kernel: int = 3
    act: bool = True
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        y = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    padding=pad, use_bias=False, name="conv")(x)
        y = make_norm(self.norm_cfg, name="bn")(y)
        return nn.relu(y) if self.act else y


class BiCornerPool(nn.Module):
    """Bidirectional corner pooling (reference ``corner_head.py:20-80``)."""

    directions: tuple
    feat_channels: int = 128
    out_channels: int = 128
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, x):
        d1 = ConvBN(self.feat_channels, norm_cfg=self.norm_cfg,
                    name="direction1_conv")(x)
        d2 = ConvBN(self.feat_channels, norm_cfg=self.norm_cfg,
                    name="direction2_conv")(x)
        pooled = (corner_pool(d1, self.directions[0])
                  + corner_pool(d2, self.directions[1]))
        aft = ConvBN(self.out_channels, act=False, norm_cfg=self.norm_cfg,
                     name="aftpool_conv")(pooled)
        c1 = ConvBN(self.out_channels, kernel=1, act=False,
                    norm_cfg=self.norm_cfg, name="conv1")(x)
        return ConvBN(self.out_channels, norm_cfg=self.norm_cfg,
                      name="conv2")(nn.relu(aft + c1))


class _Tower(nn.Module):
    """``_make_layers`` (:156-161): 3x3 conv(+relu) then plain 1x1 conv."""

    out_channels: int
    feat_channels: int = 256
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                            name="conv3")(x))
        return nn.Conv(self.out_channels, (1, 1),
                       kernel_init=normal_init(0.01),
                       bias_init=nn.initializers.constant(self.bias_init),
                       name="out")(y)


@HEADS.register
class CornerHead(nn.Module):
    """Paired-keypoint head (reference ``corner_head.py:84-321``)."""

    num_classes: int = 80
    in_channels: int = 256
    num_feat_levels: int = 2
    corner_emb_channels: int = 1
    pull_weight: float = 0.25
    push_weight: float = 0.25
    offset_weight: float = 1.0
    norm_cfg: dict | None = None
    # consumed by corner_loss (gaussian-focal alpha/gamma, AE pull/push,
    # offset loss weights)
    loss_heatmap: dict | None = None
    loss_embedding: dict | None = None
    loss_offset: dict | None = None

    @property
    def with_corner_emb(self):
        return self.corner_emb_channels > 0

    def level_forward(self, x, lvl: int):
        tl_pool = BiCornerPool(("top", "left"),
                               out_channels=self.in_channels,
                               norm_cfg=self.norm_cfg,
                               name=f"tl_pool{lvl}")(x)
        br_pool = BiCornerPool(("bottom", "right"),
                               out_channels=self.in_channels,
                               norm_cfg=self.norm_cfg,
                               name=f"br_pool{lvl}")(x)
        # heat bias prior 0.1 (reference init_weights :230)
        bias = -2.19
        tl_heat = _Tower(self.num_classes, bias_init=bias,
                         name=f"tl_heat{lvl}")(tl_pool)
        br_heat = _Tower(self.num_classes, bias_init=bias,
                         name=f"br_heat{lvl}")(br_pool)
        tl_off = _Tower(2, name=f"tl_off{lvl}")(tl_pool)
        br_off = _Tower(2, name=f"br_off{lvl}")(br_pool)
        tl_emb = br_emb = None
        if self.with_corner_emb:
            tl_emb = _Tower(self.corner_emb_channels,
                            name=f"tl_emb{lvl}")(tl_pool)
            br_emb = _Tower(self.corner_emb_channels,
                            name=f"br_emb{lvl}")(br_pool)
        return tl_heat, br_heat, tl_emb, br_emb, tl_off, br_off, \
            tl_pool, br_pool

    @nn.compact
    def __call__(self, feats, training: bool = False):
        outs = ([], [], [], [], [], [])
        for lvl in range(self.num_feat_levels):
            res = self.level_forward(feats[lvl], lvl)
            for o, r in zip(outs, res[:6]):
                o.append(r)
        return tuple(tuple(o) for o in outs)


@HEADS.register
class CentripetalHead(CornerHead):
    """CentripetalNet head (reference ``centripetal_head.py:10-426``):
    no embedding; guiding-shift + DCN feature adaption + centripetal
    shift branches per corner."""

    corner_emb_channels: int = 0
    guiding_weight: float = 0.05
    centripetal_weight: float = 1.0
    loss_guiding_shift: dict | None = None
    loss_centripetal_shift: dict | None = None

    def _centripetal_branch(self, pool, lvl: int, prefix: str):
        guiding = _Tower(2, name=f"{prefix}_guiding{lvl}")(pool)
        # dcn offsets predicted from the detached guiding shift (:186-188)
        off = nn.Conv(18, (1, 1), use_bias=False,
                      kernel_init=normal_init(0.1),
                      name=f"{prefix}_dcn_off{lvl}")(
                          jax.lax.stop_gradient(guiding))
        w = self.param(f"{prefix}_adapt_kernel{lvl}", normal_init(0.01),
                       (3, 3, pool.shape[-1], self.in_channels))
        adapted = nn.relu(deform_conv2d(pool, off, w))
        centripetal = _Tower(2, name=f"{prefix}_centripetal{lvl}")(adapted)
        return guiding, centripetal

    @nn.compact
    def __call__(self, feats, training: bool = False):
        outs = ([], [], [], [], [], [], [], [])
        for lvl in range(self.num_feat_levels):
            (tl_heat, br_heat, _, _, tl_off, br_off,
             tl_pool, br_pool) = self.level_forward(feats[lvl], lvl)
            tl_guide, tl_cent = self._centripetal_branch(tl_pool, lvl, "tl")
            br_guide, br_cent = self._centripetal_branch(br_pool, lvl, "br")
            for o, r in zip(outs, (tl_heat, br_heat, tl_off, br_off,
                                   tl_guide, br_guide, tl_cent, br_cent)):
                o.append(r)
        return tuple(tuple(o) for o in outs)


def corner_targets(head, gt_bboxes, gt_labels, gt_valid, feat_hw, img_hw,
                   with_shifts: bool = False):
    """Device corner-target generation (reference ``get_targets``
    :323-509). Returns per-image heatmaps/offset maps plus the K-padded
    integer corner coordinates (for AE-loss gathering)."""
    fh, fw = feat_hw
    ih, iw = img_hw
    wr = fw / iw
    hr = fh / ih
    nc = head.num_classes

    def per_image(boxes, labels, valid):
        sl = boxes[:, 0] * wr
        st = boxes[:, 1] * hr
        sr = boxes[:, 2] * wr
        sb = boxes[:, 3] * hr
        scx = (sl + sr) / 2.0
        scy = (st + sb) / 2.0
        li = jnp.minimum(sl, fw - 1).astype(jnp.int32)
        ri = jnp.minimum(sr, fw - 1).astype(jnp.int32)
        ti = jnp.minimum(st, fh - 1).astype(jnp.int32)
        bi = jnp.minimum(sb, fh - 1).astype(jnp.int32)
        radius = jnp.maximum(jnp.floor(gaussian_radius(
            jnp.ceil(sb - st), jnp.ceil(sr - sl), min_overlap=0.3)), 0.0)
        sigma = (2 * radius + 1) / 6.0

        ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
        xs = jnp.arange(fw, dtype=jnp.float32)[None, :]

        def splat(heat, cy, cx, j):
            dy = ys - cy
            dx = xs - cx
            g = jnp.exp(-(dx * dx + dy * dy)
                        / (2 * jnp.maximum(sigma[j], 1e-6) ** 2))
            g = jnp.where((jnp.abs(dy) <= radius[j])
                          & (jnp.abs(dx) <= radius[j]), g, 0.0)
            g = g * valid[j]
            cls = jnp.clip(labels[j], 0, nc - 1)
            return heat.at[:, :, cls].max(g)

        def scat(m, cy, cx, vals, j):
            v = valid[j]
            return m.at[cy, cx].set(
                jnp.where(v > 0, vals, m[cy, cx]))

        def body(carry, j):
            st_ = carry
            tl_h = splat(st_["tl_heat"], ti[j], li[j], j)
            br_h = splat(st_["br_heat"], bi[j], ri[j], j)
            tl_o = scat(st_["tl_off"], ti[j], li[j],
                        jnp.stack([sl[j] - li[j], st[j] - ti[j]]), j)
            br_o = scat(st_["br_off"], bi[j], ri[j],
                        jnp.stack([sr[j] - ri[j], sb[j] - bi[j]]), j)
            nxt = dict(tl_heat=tl_h, br_heat=br_h, tl_off=tl_o, br_off=br_o)
            if with_shifts:
                nxt["tl_guide"] = scat(
                    st_["tl_guide"], ti[j], li[j],
                    jnp.stack([scx[j] - li[j], scy[j] - ti[j]]), j)
                nxt["br_guide"] = scat(
                    st_["br_guide"], bi[j], ri[j],
                    jnp.stack([ri[j] - scx[j], bi[j] - scy[j]]), j)
                eps = 1e-4
                nxt["tl_cent"] = scat(
                    st_["tl_cent"], ti[j], li[j],
                    jnp.log(jnp.maximum(
                        jnp.stack([scx[j] - sl[j], scy[j] - st[j]]), eps)),
                    j)
                nxt["br_cent"] = scat(
                    st_["br_cent"], bi[j], ri[j],
                    jnp.log(jnp.maximum(
                        jnp.stack([sr[j] - scx[j], sb[j] - scy[j]]), eps)),
                    j)
            return nxt, None

        init = dict(tl_heat=jnp.zeros((fh, fw, nc)),
                    br_heat=jnp.zeros((fh, fw, nc)),
                    tl_off=jnp.zeros((fh, fw, 2)),
                    br_off=jnp.zeros((fh, fw, 2)))
        if with_shifts:
            for key in ("tl_guide", "br_guide", "tl_cent", "br_cent"):
                init[key] = jnp.zeros((fh, fw, 2))
        out, _ = jax.lax.scan(body, init, jnp.arange(boxes.shape[0]))
        out.update(tl_y=ti, tl_x=li, br_y=bi, br_x=ri)
        return out

    return jax.vmap(per_image)(gt_bboxes, gt_labels,
                               gt_valid.astype(jnp.float32))


def _det_and_off_loss(head, tl_heat, br_heat, tl_off, br_off, t,
                      axis_name=None):
    """GaussianFocal det loss + SmoothL1 offset loss at GT corner pixels
    (reference ``loss_single`` :573-649)."""
    hm_cfg = dict(head.loss_heatmap or {})
    hm_alpha = float(hm_cfg.get("alpha", 2.0))
    hm_gamma = float(hm_cfg.get("gamma", 4.0))
    hm_lw = float(hm_cfg.get("loss_weight", 1.0))
    off_cfg = dict(head.loss_offset or {})
    off_beta = float(off_cfg.get("beta", 1.0))
    off_lw = float(off_cfg.get("loss_weight", 1.0))

    def _one(hm_pred, hm_t, off_pred, off_t):
        avg = jnp.maximum((hm_t == 1.0).sum().astype(jnp.float32), 1.0)
        if axis_name:
            avg = jax.lax.psum(avg, axis_name)
        # mmdet avg_factor applies under reduction='mean' (sum/avg_factor);
        # 'sum' would silently skip the normalization
        pred = jax.nn.sigmoid(hm_pred)
        det = hm_lw * L.gaussian_focal_loss(
            pred, hm_t, alpha=hm_alpha, gamma=hm_gamma,
            reduction="mean", avg_factor=avg)
        mask = ((hm_t == 1.0).sum(-1, keepdims=True) > 0).astype(jnp.float32)
        off_avg = jnp.maximum(mask.sum(), 1.0)
        if axis_name:
            off_avg = jax.lax.psum(off_avg, axis_name)
        off = off_lw * L.smooth_l1_loss(
            off_pred, off_t, beta=off_beta,
            weight=jnp.broadcast_to(mask, off_t.shape),
            reduction="mean", avg_factor=off_avg)
        return det, off, mask, off_avg

    tl_det, tl_off_l, tl_mask, tl_avg = _one(tl_heat, t["tl_heat"],
                                             tl_off, t["tl_off"])
    br_det, br_off_l, br_mask, br_avg = _one(br_heat, t["br_heat"],
                                             br_off, t["br_off"])
    det_loss = (tl_det + br_det) / 2.0
    off_loss = head.offset_weight * (tl_off_l + br_off_l) / 2.0
    return det_loss, off_loss, (tl_mask, tl_avg, br_mask, br_avg)


def _gather_at(m, yy, xx):
    """Gather (B, H, W, C) at per-image (B, K) integer coords."""
    return jax.vmap(lambda mm, y1, x1: mm[y1, x1])(m, yy, xx)


def corner_loss(head, outputs, batch, axis_name=None):
    """Reference ``CornerHead.loss`` (:511-571): the same image-level targets
    supervise every feature level."""
    tl_heats, br_heats, tl_embs, br_embs, tl_offs, br_offs = outputs
    fh, fw = tl_heats[-1].shape[1:3]
    img_hw = (batch["images"].shape[1], batch["images"].shape[2])
    t = corner_targets(head, batch["gt_bboxes"], batch["gt_labels"],
                       batch["gt_valid"], (fh, fw), img_hw)
    losses = {}
    det_total = off_total = pull_total = push_total = 0.0
    for lvl in range(len(tl_heats)):
        det, off, _ = _det_and_off_loss(
            head, tl_heats[lvl], br_heats[lvl], tl_offs[lvl], br_offs[lvl],
            t, axis_name)
        det_total = det_total + det
        off_total = off_total + off
        if head.with_corner_emb:
            emb_cfg = dict(head.loss_embedding or {})
            tl_e = _gather_at(tl_embs[lvl], t["tl_y"], t["tl_x"])
            br_e = _gather_at(br_embs[lvl], t["br_y"], t["br_x"])
            pull, push = L.ae_loss(
                tl_e, br_e, batch["gt_valid"],
                pull_weight=float(emb_cfg.get("pull_weight",
                                              head.pull_weight)),
                push_weight=float(emb_cfg.get("push_weight",
                                              head.push_weight)))
            pull_total = pull_total + pull
            push_total = push_total + push
    losses["det_loss"] = det_total
    losses["off_loss"] = off_total
    if head.with_corner_emb:
        losses["pull_loss"] = pull_total
        losses["push_loss"] = push_total
    return losses


def centripetal_loss(head, outputs, batch, axis_name=None):
    """Reference ``CentripetalHead.loss`` (:205-280)."""
    (tl_heats, br_heats, tl_offs, br_offs,
     tl_guides, br_guides, tl_cents, br_cents) = outputs
    fh, fw = tl_heats[-1].shape[1:3]
    img_hw = (batch["images"].shape[1], batch["images"].shape[2])
    t = corner_targets(head, batch["gt_bboxes"], batch["gt_labels"],
                       batch["gt_valid"], (fh, fw), img_hw,
                       with_shifts=True)
    det_total = off_total = guide_total = cent_total = 0.0
    for lvl in range(len(tl_heats)):
        det, off, (tl_mask, tl_avg, br_mask, br_avg) = _det_and_off_loss(
            head, tl_heats[lvl], br_heats[lvl], tl_offs[lvl], br_offs[lvl],
            t, axis_name)
        det_total = det_total + det
        off_total = off_total + off

        def _shift(pred, target, mask, avg, w):
            return w * L.smooth_l1_loss(
                pred, target, beta=1.0,
                weight=jnp.broadcast_to(mask, target.shape),
                reduction="mean", avg_factor=avg)

        gw = float(dict(head.loss_guiding_shift or {}).get(
            "loss_weight", head.guiding_weight))
        cw = float(dict(head.loss_centripetal_shift or {}).get(
            "loss_weight", head.centripetal_weight))
        guide_total = guide_total + (
            _shift(tl_guides[lvl], t["tl_guide"], tl_mask, tl_avg, gw)
            + _shift(br_guides[lvl], t["br_guide"], br_mask, br_avg,
                     gw)) / 2.0
        cent_total = cent_total + (
            _shift(tl_cents[lvl], t["tl_cent"], tl_mask, tl_avg, cw)
            + _shift(br_cents[lvl], t["br_cent"], br_mask, br_avg,
                     cw)) / 2.0
    return dict(det_loss=det_total, off_loss=off_total,
                guiding_loss=guide_total, centripetal_loss=cent_total)


def _local_max(heat, kernel=3):
    pad = kernel // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return jnp.where(hmax == heat, heat, 0.0)


def corner_get_bboxes(head, outputs, img_shapes=None, scale_factors=None,
                      score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                      corner_topk=100, local_maximum_kernel=3,
                      distance_threshold=0.5, num_dets=1000):
    """k x k corner-pair decode (reference ``decode_heatmap`` :818-1052 +
    ``_get_bboxes_single``/NMS :709-816), batched under jit.

    The input image is the padded canvas = stride 4 x feature size exactly
    (Hourglass stem), so the up-scale factor is the constant 4.
    """
    centripetal = len(outputs) == 8
    if centripetal:
        (tl_heats, br_heats, tl_offs, br_offs,
         _, _, tl_cents, br_cents) = outputs
    else:
        tl_heats, br_heats, tl_embs, br_embs, tl_offs, br_offs = outputs
    b, fh, fw, nc = tl_heats[-1].shape
    k = min(corner_topk, fh * fw)
    stride = 4.0

    tl_heat = _local_max(jax.nn.sigmoid(tl_heats[-1]), local_maximum_kernel)
    br_heat = _local_max(jax.nn.sigmoid(br_heats[-1]), local_maximum_kernel)

    def topk(heat):
        flat = heat.reshape(b, -1)                  # (H, W, C) row-major
        scores, idx = jax.lax.top_k(flat, k)
        cls = idx % nc
        xs = (idx // nc) % fw
        ys = idx // (nc * fw)
        return scores, cls, ys, xs

    tl_s, tl_c, tl_y, tl_x = topk(tl_heat)
    br_s, br_c, br_y, br_x = topk(br_heat)

    tl_o = _gather_at(tl_offs[-1], tl_y, tl_x)       # (B, k, 2)
    br_o = _gather_at(br_offs[-1], br_y, br_x)
    tl_xs = (tl_x + tl_o[..., 0])[:, :, None]        # (B, k, 1)
    tl_ys = (tl_y + tl_o[..., 1])[:, :, None]
    br_xs = (br_x + br_o[..., 0])[:, None, :]        # (B, 1, k)
    br_ys = (br_y + br_o[..., 1])[:, None, :]

    if centripetal:
        tl_ct = jnp.exp(_gather_at(tl_cents[-1], tl_y, tl_x))[:, :, None]
        br_ct = jnp.exp(_gather_at(br_cents[-1], br_y, br_x))[:, None, :]
        tl_ctx = (tl_xs + tl_ct[..., 0]) * stride
        tl_cty = (tl_ys + tl_ct[..., 1]) * stride
        br_ctx = (br_xs - br_ct[..., 0]) * stride
        br_cty = (br_ys - br_ct[..., 1]) * stride

    tl_xs, tl_ys = tl_xs * stride, tl_ys * stride
    br_xs, br_ys = br_xs * stride, br_ys * stride
    tl_xs = jnp.maximum(tl_xs, 0.0)
    tl_ys = jnp.maximum(tl_ys, 0.0)
    br_xs = jnp.maximum(br_xs, 0.0)
    br_ys = jnp.maximum(br_ys, 0.0)

    scores = (tl_s[:, :, None] + br_s[:, None, :]) / 2.0
    bad = (tl_c[:, :, None] != br_c[:, None, :])
    bad |= (br_xs <= tl_xs) | (br_ys <= tl_ys)

    if centripetal:
        # central-region test (reference :959-1000)
        tl_ctx = jnp.maximum(tl_ctx, 0.0)
        tl_cty = jnp.maximum(tl_cty, 0.0)
        br_ctx = jnp.maximum(br_ctx, 0.0)
        br_cty = jnp.maximum(br_cty, 0.0)
        area = jnp.abs((br_xs - tl_xs) * (br_ys - tl_ys))
        area_ct = jnp.abs((br_ctx - tl_ctx) * (br_cty - tl_cty))
        mu = jnp.where(area > 3500, 1 / 2.1, 1 / 2.4)
        cx = (tl_xs + br_xs) / 2
        cy = (tl_ys + br_ys) / 2
        rx1 = cx - mu * (br_xs - tl_xs) / 2
        ry1 = cy - mu * (br_ys - tl_ys) / 2
        rx2 = cx + mu * (br_xs - tl_xs) / 2
        ry2 = cy + mu * (br_ys - tl_ys) / 2
        area_r = jnp.abs((rx2 - rx1) * (ry2 - ry1))
        dists = area_ct / jnp.maximum(area_r, 1e-6)
        bad |= (tl_ctx <= rx1) | (tl_ctx >= rx2)
        bad |= (tl_cty <= ry1) | (tl_cty >= ry2)
        bad |= (br_ctx <= rx1) | (br_ctx >= rx2)
        bad |= (br_cty <= ry1) | (br_cty >= ry2)
    else:
        tl_e = _gather_at(tl_embs[-1], tl_y, tl_x)   # (B, k, M)
        br_e = _gather_at(br_embs[-1], br_y, br_x)
        dists = jnp.abs(tl_e[:, :, None, 0] - br_e[:, None, :, 0])
    bad |= dists > distance_threshold

    scores = jnp.where(bad, -1.0, scores)
    n = min(num_dets, k * k)
    flat_scores, inds = jax.lax.top_k(scores.reshape(b, -1), n)
    boxes = jnp.stack(
        [jnp.broadcast_to(tl_xs, (b, k, k)).reshape(b, -1),
         jnp.broadcast_to(tl_ys, (b, k, k)).reshape(b, -1),
         jnp.broadcast_to(br_xs, (b, k, k)).reshape(b, -1),
         jnp.broadcast_to(br_ys, (b, k, k)).reshape(b, -1)], axis=-1)
    boxes = jnp.take_along_axis(boxes, inds[..., None], axis=1)
    cls = jnp.take_along_axis(
        jnp.broadcast_to(tl_c[:, :, None], (b, k, k)).reshape(b, -1),
        inds, axis=1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc, cl):
        dets, _, out_valid, out_labels = batched_nms(
            bx, sc, cl, iou_threshold=iou_threshold, max_out=max_per_img,
            valid=sc > -0.1)
        return dets, out_labels, out_valid & (dets[:, 4] > score_thr)

    return jax.vmap(_single)(boxes, flat_scores, cls)
