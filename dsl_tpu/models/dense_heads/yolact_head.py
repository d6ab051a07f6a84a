"""YOLACT: anchor head with mask coefficients + protonet + segm head.

Parity with ``/root/reference/mmdet/models/dense_heads/yolact_head.py:13-1010``
(YOLACTHead: shared convs, softmax CE with SSD-style OHEM, smooth-L1 x1.5,
per-anchor mask coefficients (tanh); YOLACTProtonet: conv stack with a 2x
bilinear upsample producing ``num_protos`` prototype maps, instance mask =
sigmoid(protos @ coeffs) cropped to the box, BCE reweighted by box area;
YOLACTSegmHead: 1x1 conv with per-class union masks + BCE) and
``detectors/yolact.py:9-116``.

TPU redesign: positives are selected as a fixed-size top-k of the dense
assignment mask (static shapes), GT masks arrive as per-GT normalized
crops (``gt_mask_crops`` (K, M, M), see ``data/formatting.py``) and the
proto-resolution targets are rebuilt on device by bilinear paste — no
per-image python, the whole loss jits.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.assigners import max_iou_assign
from dsl_tpu.core.boxes import bbox2delta, delta2bbox
from dsl_tpu.core.nms import batched_nms  # noqa: F401 (train-path users)
from dsl_tpu.models.layers import normal_init


@HEADS.register
class YOLACTHead(nn.Module):
    """Box/cls/coeff head (reference ``yolact_head.py:13-135``)."""

    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    num_head_convs: int = 1
    num_protos: int = 32
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 3
    scales_per_octave: int = 1
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    neg_pos_ratio: int = 3
    max_masks_to_train: int = 100
    anchor_generator: dict | None = None
    loss_cls: dict | None = None
    loss_bbox: dict | None = None
    use_ohem: bool = True

    def make_anchor_generator(self) -> AnchorGenerator:
        cfg = dict(self.anchor_generator or {})
        return AnchorGenerator(
            strides=cfg.get("strides", list(self.strides)),
            ratios=cfg.get("ratios", list(self.anchor_ratios)),
            octave_base_scale=cfg.get("octave_base_scale",
                                      self.octave_base_scale),
            scales_per_octave=cfg.get("scales_per_octave",
                                      self.scales_per_octave))

    @nn.compact
    def __call__(self, feats, training: bool = False):
        na = len(self.anchor_ratios) * self.scales_per_octave
        convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                         name=f"head_conv{i}")
                 for i in range(self.num_head_convs)]
        conv_cls = nn.Conv(na * (self.num_classes + 1), (3, 3), padding=1,
                           kernel_init=normal_init(0.01), name="conv_cls")
        conv_reg = nn.Conv(na * 4, (3, 3), padding=1,
                           kernel_init=normal_init(0.01), name="conv_reg")
        conv_coeff = nn.Conv(na * self.num_protos, (3, 3), padding=1,
                             kernel_init=normal_init(0.01), name="conv_coeff")
        cls_scores, bbox_preds, coeff_preds = [], [], []
        for x in feats:
            for conv in convs:
                x = nn.relu(conv(x))
            cls_scores.append(conv_cls(x))
            bbox_preds.append(conv_reg(x))
            coeff_preds.append(jnp.tanh(conv_coeff(x)))
        return tuple(cls_scores), tuple(bbox_preds), tuple(coeff_preds)


@HEADS.register
class YOLACTProtonet(nn.Module):
    """Prototype net on P3 (reference ``yolact_head.py:589-672``): three
    3x3 convs, 2x bilinear upsample, 3x3 conv, 1x1 to num_protos."""

    num_protos: int = 32
    in_channels: int = 256
    proto_channels: Sequence[int] = (256, 256, 256)
    # reference yolact config :59 ``loss_mask_weight=6.125`` — scales the
    # per-instance mask BCE (``YOLACTProtonet.loss:790``)
    loss_mask_weight: float = 6.125

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate(self.proto_channels):
            x = nn.relu(nn.Conv(ch, (3, 3), padding=1,
                                name=f"proto_conv{i}")(x))
        x = jax.image.resize(
            x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
            method="bilinear")
        x = nn.relu(nn.Conv(self.proto_channels[-1], (3, 3), padding=1,
                            name="post_up_conv")(x))
        return nn.relu(nn.Conv(self.num_protos, (1, 1), name="proto_out")(x))


@HEADS.register
class YOLACTSegmHead(nn.Module):
    """Training-only semantic head (reference ``yolact_head.py:459-586``)."""

    num_classes: int = 80
    in_channels: int = 256

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.num_classes, (1, 1), name="segm_conv")(x)


def _bilinear_1ch(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Bilinear sample a single-channel (H, W) image at float coords."""
    h, w = img.shape
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    v = (img[y0i, x0i] * (1 - wy) * (1 - wx) + img[y0i, x1i] * (1 - wy) * wx
         + img[y1i, x0i] * wy * (1 - wx) + img[y1i, x1i] * wy * wx)
    return v


def paste_gt_crops(crops, boxes, valid, out_hw, img_hw):
    """Paste per-GT normalized mask crops (K, M, M) into (K, h, w) canvases
    at their boxes — the device-side inverse of ``gt_mask_crop``; replaces
    the reference's full-image ``F.interpolate(gt_masks)``."""
    h, w = out_hw
    ih, iw = img_hw
    m = crops.shape[-1]
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (ih / h)
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (iw / w)

    def per_gt(crop, box, v):
        x1, y1, x2, y2 = box
        bw = jnp.maximum(x2 - x1, 1e-3)
        bh = jnp.maximum(y2 - y1, 1e-3)
        ny = (py - y1) / bh
        nx = (px - x1) / bw
        inside = ((ny[:, None] >= 0) & (ny[:, None] <= 1)
                  & (nx[None, :] >= 0) & (nx[None, :] <= 1))
        sy = jnp.broadcast_to(ny[:, None] * m - 0.5, (h, w))
        sx = jnp.broadcast_to(nx[None, :] * m - 0.5, (h, w))
        vals = _bilinear_1ch(crop.astype(jnp.float32), sy, sx)
        return jnp.where(inside, vals, 0.0) * v

    return jax.vmap(per_gt)(crops, boxes, valid.astype(jnp.float32))


def _crop_mask(mask, box, img_hw):
    """Zero a proto-space (h, w) mask outside the (input-coords) box
    (reference ``crop``/``sanitize_coordinates`` :869-926, padding=1 px)."""
    h, w = mask.shape
    ih, iw = img_hw
    cy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (ih / h)
    cx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (iw / w)
    pad_y, pad_x = ih / h, iw / w
    x1, y1, x2, y2 = box
    inside = ((cy[:, None] >= y1 - pad_y) & (cy[:, None] < y2 + pad_y)
              & (cx[None, :] >= x1 - pad_x) & (cx[None, :] < x2 + pad_x))
    return mask * inside


def yolact_loss(head, outputs, batch, axis_name=None,
                mask_weight: float = 6.125):
    """Box/cls OHEM loss + protonet mask loss + segm loss
    (reference ``YOLACTHead.loss`` :137-258, ``loss_single_OHEM`` :260-303,
    ``YOLACTProtonet.loss`` :734-806, ``YOLACTSegmHead.loss`` :512-545).

    ``mask_weight`` is the protonet's ``loss_mask_weight`` (config 6.125),
    passed in by the dispatch from ``detector.proto_head``."""
    cls_scores, bbox_preds, coeff_preds, protos, segm_pred = outputs
    if not head.use_ohem:
        # the reference config always trains with OHEM (yolact_r50_1x8_coco
        # ``use_ohem=True``); the sampling-based alternative is not built —
        # reject rather than silently computing a different loss
        raise NotImplementedError("YOLACTHead only supports use_ohem=True")
    nc = head.num_classes
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = gen.flat_anchors(featmap_sizes)

    # reference train_cfg: MaxIoUAssigner(0.5/0.4, min_pos_iou=0.,
    # gt_max_assign_all=False) — only the single best anchor per gt
    labels, assigned, weights, _ = max_iou_assign(
        anchors, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
        pos_iou_thr=head.pos_iou_thr, neg_iou_thr=head.neg_iou_thr,
        min_pos_iou=0.0, num_classes=nc, gt_max_assign_all=False)

    b, a = labels.shape
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc + 1) for c in cls_scores], axis=1)
    flat_reg = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1)
    flat_coeff = jnp.concatenate(
        [c.reshape(b, -1, head.num_protos) for c in coeff_preds], axis=1)

    pos = labels < nc
    pos_f = pos.astype(jnp.float32)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    num_pos = jnp.maximum(_psum(jnp.sum(pos_f)), 1.0)

    # OHEM CE (SSD-style 3:1 hard negatives)
    ce = L.cross_entropy(flat_cls, labels, reduction="none")
    neg_mask = (labels == nc) & (weights > 0)
    neg_loss = jnp.where(neg_mask, ce, -1e30)
    n_pos_img = jnp.sum(pos_f, axis=1)
    sorted_neg = -jnp.sort(-neg_loss, axis=1)
    idx = jnp.clip((head.neg_pos_ratio * n_pos_img).astype(jnp.int32),
                   1, a - 1)
    thresh = jnp.take_along_axis(sorted_neg, idx[:, None], axis=1)
    keep_neg = neg_mask & (neg_loss > thresh)
    # honor loss dicts (reference yolact config :44-49: softmax-CE w1,
    # SmoothL1 beta 1 w1.5) or fail loudly
    cls_cfg = dict(head.loss_cls or {})
    if cls_cfg.get("type", "CrossEntropyLoss") != "CrossEntropyLoss" or \
            cls_cfg.get("use_sigmoid", False):
        raise NotImplementedError(
            f"YOLACT loss_cls {cls_cfg.get('type')!r} unsupported")
    bbox_cfg = dict(head.loss_bbox or {})
    if bbox_cfg.get("type", "SmoothL1Loss") != "SmoothL1Loss":
        raise NotImplementedError(
            f"YOLACT loss_bbox {bbox_cfg.get('type')!r} unsupported")

    cls_w = pos_f + keep_neg.astype(jnp.float32)
    loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * \
        jnp.sum(ce * cls_w) / num_pos

    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None], axis=1)
    tgt = bbox2delta(anchors[None], gt, head.target_means, head.target_stds)
    loss_bbox = float(bbox_cfg.get("loss_weight", 1.5)) * L.smooth_l1_loss(
        flat_reg, tgt, beta=float(bbox_cfg.get("beta", 1.0)),
        weight=pos_f[..., None], avg_factor=num_pos)
    losses = dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    img_hw = (batch["images"].shape[1], batch["images"].shape[2])
    ph, pw = protos.shape[1:3]

    # ---- protonet mask loss over a fixed-size positive subset ----
    n_sel = min(head.max_masks_to_train, a)
    sel_score, sel_idx = jax.lax.top_k(pos_f, n_sel)        # first positives
    sel_valid = sel_score > 0                               # (B, n_sel)
    sel_coeff = jnp.take_along_axis(flat_coeff, sel_idx[..., None], axis=1)
    sel_gt = jnp.take_along_axis(jnp.maximum(assigned, 0), sel_idx, axis=1)
    sel_boxes = jnp.take_along_axis(batch["gt_bboxes"],
                                    sel_gt[..., None], axis=1)
    crops = batch["gt_mask_crops"]                          # (B, K, M, M)
    sel_crops = jnp.take_along_axis(
        crops, sel_gt[..., None, None].astype(jnp.int32), axis=1)

    mask_pred = jax.nn.sigmoid(
        jnp.einsum("bhwp,bnp->bnhw", protos, sel_coeff))    # (B, N, ph, pw)
    mask_pred = jax.vmap(jax.vmap(_crop_mask, in_axes=(0, 0, None)),
                         in_axes=(0, 0, None))(mask_pred, sel_boxes, img_hw)
    targets = jax.vmap(paste_gt_crops, in_axes=(0, 0, 0, None, None))(
        sel_crops, sel_boxes, sel_valid, (ph, pw), img_hw)

    p = jnp.clip(mask_pred, 1e-4, 1 - 1e-4)
    bce = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
    bw = jnp.maximum(sel_boxes[..., 2] - sel_boxes[..., 0], 1.0) / img_hw[1]
    bh = jnp.maximum(sel_boxes[..., 3] - sel_boxes[..., 1], 1.0) / img_hw[0]
    per_inst = bce.mean(axis=(2, 3)) / bw / bh              # (B, N)
    total_sel = jnp.maximum(_psum(sel_valid.astype(jnp.float32).sum()), 1.0)
    losses["loss_mask"] = mask_weight * jnp.sum(
        per_inst * sel_valid.astype(jnp.float32)) / total_sel

    # ---- segm head loss: per-class union target ----
    sh, sw = segm_pred.shape[1:3]
    pasted = jax.vmap(paste_gt_crops, in_axes=(0, 0, 0, None, None))(
        crops, batch["gt_bboxes"], batch["gt_valid"], (sh, sw), img_hw)
    pasted = (pasted > 0.5).astype(jnp.float32)             # (B, K, sh, sw)

    def union(per_img, lbls):
        def body(canvas, j):
            cls = jnp.clip(lbls[j], 0, nc - 1)
            return canvas.at[:, :, cls].max(per_img[j]), None
        out, _ = jax.lax.scan(body, jnp.zeros((sh, sw, nc)),
                              jnp.arange(per_img.shape[0]))
        return out

    segm_t = jax.vmap(union)(pasted, batch["gt_labels"])
    losses["loss_segm"] = L.binary_cross_entropy(
        segm_pred, segm_t, reduction="mean",
        avg_factor=float(b * sh * sw))
    return losses


def yolact_predict(head, outputs, img_shapes=None, scale_factors=None,
                   nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                   max_per_img=100, mask_crop_size: int = 56,
                   img_hw=None):
    """Decode + NMS + proto mask assembly (reference ``get_bboxes``
    :305-457 with fast_nms; masks via ``YOLACTProtonet.forward`` test branch
    :672-731 — here returned as per-detection (S, S) crops for the host
    paster, the same contract as ``mask_rcnn_predict``)."""
    cls_scores, bbox_preds, coeff_preds, protos, _ = outputs
    nc = head.num_classes
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    lvl_anchors = gen.grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]

    boxes_all, scores_all, coeff_all = [], [], []
    for lvl in range(len(cls_scores)):
        scores = jax.nn.softmax(
            cls_scores[lvl].reshape(b, -1, nc + 1), axis=-1)[..., :nc]
        reg = bbox_preds[lvl].reshape(b, -1, 4)
        coeff = coeff_preds[lvl].reshape(b, -1, head.num_protos)
        anchors = lvl_anchors[lvl][None].repeat(b, axis=0)
        k = min(nms_pre, scores.shape[1])
        rank = jnp.max(scores, axis=-1)
        _, top = jax.lax.top_k(rank, k)
        take = lambda t: jnp.take_along_axis(
            t, top.reshape(b, k, *(1,) * (t.ndim - 2)), axis=1)
        scores, reg, coeff, anchors = (take(scores), take(reg), take(coeff),
                                       take(anchors))
        boxes_all.append(delta2bbox(anchors, reg, head.target_means,
                                    head.target_stds))
        scores_all.append(scores)
        coeff_all.append(coeff)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    coeffs = jnp.concatenate(coeff_all, axis=1)

    if img_hw is None:
        img_hw = (1e9, 1e9)

    def _single(bx, sc, cf, proto):
        # Fast NMS — the reference's YOLACT test path (fast_nms :305-457):
        # per-class triu-max IoU suppression, fully parallel
        from dsl_tpu.core.nms import fast_nms

        dets, out_labels, box_idx, out_valid = fast_nms(
            bx, sc, score_thr=score_thr, iou_threshold=iou_threshold,
            top_k=200, max_num=max_per_img)
        kept_coeff = cf[box_idx]                          # (max_per_img, P)
        masks = jax.nn.sigmoid(
            jnp.einsum("hwp,np->nhw", proto, kept_coeff))
        masks = jax.vmap(_crop_mask, in_axes=(0, 0, None))(
            masks, dets[:, :4], img_hw)
        # resample each mask to an (S, S) crop at its box
        s = mask_crop_size
        ih, iw = img_hw
        ph, pw = proto.shape[:2]

        def crop_at_box(mask, box):
            x1, y1, x2, y2 = box
            ys = (y1 + (jnp.arange(s) + 0.5) / s * jnp.maximum(y2 - y1, 1e-3)
                  ) * (ph / ih) - 0.5
            xs = (x1 + (jnp.arange(s) + 0.5) / s * jnp.maximum(x2 - x1, 1e-3)
                  ) * (pw / iw) - 0.5
            return _bilinear_1ch(mask, jnp.broadcast_to(ys[:, None], (s, s)),
                                 jnp.broadcast_to(xs[None, :], (s, s)))

        mask_crops = jax.vmap(crop_at_box)(masks, dets[:, :4])
        return dets, out_labels, out_valid, mask_crops

    dets, labels, valid, mask_crops = jax.vmap(_single)(
        boxes, scores, coeffs, protos)
    if scale_factors is not None:
        dets = jnp.concatenate(
            [dets[..., :4] / scale_factors[:, None, :], dets[..., 4:]],
            axis=-1)
    return dets, labels, valid, mask_crops


def yolact_full_predict(detector, variables, images, img_shapes=None,
                        scale_factors=None, test_cfg: dict | None = None):
    """Boxes + per-detection mask crops — the ``mask_rcnn_predict`` contract
    (host pastes with ``mask_head.paste_masks``)."""
    outputs = detector.apply(variables, images, training=False)
    tc = dict(test_cfg or detector.test_cfg or {})
    nms_cfg = dict(tc.get("nms", {}) or {})
    return yolact_predict(
        detector.bbox_head, outputs, img_shapes=img_shapes,
        scale_factors=scale_factors, nms_pre=tc.get("nms_pre", 1000),
        score_thr=tc.get("score_thr", 0.05),
        iou_threshold=nms_cfg.get("iou_threshold",
                                  tc.get("iou_thr", 0.5)),
        max_per_img=tc.get("max_per_img", 100),
        img_hw=images.shape[1:3])
