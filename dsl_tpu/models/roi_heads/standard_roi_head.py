"""Standard RoI head (Shared2FC bbox head) for the two-stage tier.

Parity with ``/root/reference/mmdet/models/roi_heads/standard_roi_head.py``
+ ``bbox_heads/convfc_bbox_head.py`` (Shared2FCBBoxHead): multi-level
RoIAlign with FPN level assignment ``floor(4 + log2(sqrt(area)/224))``
(``single_level_roi_extractor``), two shared FCs, softmax CE over C+1
classes, class-specific smooth-L1 deltas; training samples 512 rois/image at
1:3 pos:neg from MaxIoU-assigned proposals (RandomSampler semantics via a
priority sort — fixed shapes under jit).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import HEADS
from dsl_tpu.core.assigners import _max_iou_assign_single
from dsl_tpu.core.boxes import resolve_delta_coder
from dsl_tpu.core import losses as L
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.ops.roi_align import roi_align
from dsl_tpu.models.layers import normal_init


@HEADS.register
class Shared2FCBBoxHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    roi_size: int = 7
    fc_channels: int = 1024
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    with_reg: bool = True     # Grid R-CNN uses a cls-only bbox head
    reg_class_agnostic: bool = False   # cascade stages regress 4, not C*4
    roi_extractor: str = "single"   # 'single' | 'sum' | 'concat' (generic)
    loss_cls: dict | None = None    # dict(type='SeesawLoss', ...) supported
    loss_bbox: dict | None = None   # L1(default)/SmoothL1/Balanced/IoU-family
    reg_decoded_bbox: bool = False  # loss on decoded boxes (bbox_head.py:72)
    bbox_coder: dict | None = None  # LegacyDeltaXYWHBBoxCoder supported
    roi_aligned: bool = True        # RoIAlign aligned=False (legacy_1.x)

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats: (N, roi, roi, C) -> (cls_logits (N, C+1),
        deltas (N, C*4) — or (N, 4) when ``reg_class_agnostic``). With
        SeesawLoss the cls head emits C+2 channels (C classes + 2
        objectness, ``seesaw_loss.py`` split head)."""
        n = roi_feats.shape[0]
        x = roi_feats.reshape(n, -1)
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc1")(x))
        seesaw = dict(self.loss_cls or {}).get("type") == "SeesawLoss"
        cls = nn.Dense(self.num_classes + (2 if seesaw else 1),
                       kernel_init=normal_init(0.01), name="fc_cls")(x)
        reg_dim = 4 if self.reg_class_agnostic else self.num_classes * 4
        if not self.with_reg:
            return cls, jnp.zeros((n, reg_dim), cls.dtype)
        reg = nn.Dense(reg_dim,
                       kernel_init=normal_init(0.001), name="fc_reg")(x)
        return cls, reg


@HEADS.register
class Shared4Conv1FCBBoxHead(nn.Module):
    """ConvFCBBoxHead(num_shared_convs=4, num_shared_fcs=1) — reference
    ``roi_heads/bbox_heads/convfc_bbox_head.py`` Shared4Conv1FCBBoxHead,
    the ``gn+ws`` family's RoI head. Supports conv_cfg (ConvWS) and
    norm_cfg (GN) on the shared convs."""

    num_classes: int = 80
    in_channels: int = 256
    roi_size: int = 7
    conv_out_channels: int = 256
    fc_channels: int = 1024
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    with_reg: bool = True
    reg_class_agnostic: bool = False
    roi_extractor: str = "single"
    loss_cls: dict | None = None
    loss_bbox: dict | None = None
    reg_decoded_bbox: bool = False
    bbox_coder: dict | None = None
    roi_aligned: bool = True
    conv_cfg: dict | None = None
    norm_cfg: dict | None = None

    @nn.compact
    def __call__(self, roi_feats):
        from dsl_tpu.models.layers import make_conv, make_norm

        x = roi_feats
        for i in range(4):
            x = make_conv(self.conv_cfg, self.conv_out_channels, 3,
                          use_bias=self.norm_cfg is None,
                          name=f"shared_conv{i}")(x)
            if self.norm_cfg is not None:
                x = make_norm(self.norm_cfg, name=f"shared_norm{i}")(x)
            x = nn.relu(x)
        n = x.shape[0]
        x = nn.relu(nn.Dense(self.fc_channels,
                             name="shared_fc0")(x.reshape(n, -1)))
        seesaw = dict(self.loss_cls or {}).get("type") == "SeesawLoss"
        cls = nn.Dense(self.num_classes + (2 if seesaw else 1),
                       kernel_init=normal_init(0.01), name="fc_cls")(x)
        reg_dim = 4 if self.reg_class_agnostic else self.num_classes * 4
        if not self.with_reg:
            return cls, jnp.zeros((n, reg_dim), cls.dtype)
        reg = nn.Dense(reg_dim,
                       kernel_init=normal_init(0.001), name="fc_reg")(x)
        return cls, reg


@HEADS.register
class DeformRoIPoolPack(nn.Module):
    """Deformable RoI pooling offset predictor (mmcv
    ``ops/deform_roi_pool.py`` DeformRoIPoolPack / ModulatedDeformRoIPoolPack,
    reference ``configs/dcn/faster_rcnn_r50_fpn_dpool_1x_coco.py``): two FC
    layers on the plain-pooled roi features predict per-bin (dx, dy)
    offsets (zero-init -> identity at start); the modulated variant adds a
    sigmoid per-bin mask branch."""

    output_size: int = 7
    output_channels: int = 256
    deform_fc_channels: int = 1024
    gamma: float = 0.1
    modulated: bool = False

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats (N, oh, ow, C) -> (offsets (N, oh, ow, 2),
        mask (N, oh, ow, 1) or None)."""
        n = roi_feats.shape[0]
        oh = ow = self.output_size
        x = roi_feats.reshape(n, -1)
        h = nn.relu(nn.Dense(self.deform_fc_channels, name="offset_fc0")(x))
        h = nn.relu(nn.Dense(self.deform_fc_channels, name="offset_fc1")(h))
        off = nn.Dense(oh * ow * 2, kernel_init=nn.initializers.zeros,
                       name="offset_fc2")(h).reshape(n, oh, ow, 2)
        if not self.modulated:
            return off, None
        m = nn.relu(nn.Dense(self.deform_fc_channels, name="mask_fc0")(x))
        m = nn.Dense(oh * ow, kernel_init=nn.initializers.zeros,
                     name="mask_fc1")(m)
        return off, jax.nn.sigmoid(m).reshape(n, oh, ow, 1)


@HEADS.register
class ModulatedDeformRoIPoolPack(DeformRoIPoolPack):
    modulated: bool = True


def map_rois_to_levels(rois: jnp.ndarray, num_levels: int,
                       finest_scale: int = 56) -> jnp.ndarray:
    """FPN level per roi (mmdet single-level extractor formula)."""
    scale = jnp.sqrt(jnp.maximum(
        (rois[..., 2] - rois[..., 0]) * (rois[..., 3] - rois[..., 1]), 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def extract_roi_feats(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                      valid: jnp.ndarray, strides: Sequence[int],
                      roi_size: int = 7, aligned: bool = True) -> jnp.ndarray:
    """Multi-level RoIAlign: compute each level's answer for every roi and
    select by assigned level (static shapes; levels ≤ 4)."""
    num_levels = min(len(feats), 4)
    levels = map_rois_to_levels(rois[:, 1:5], num_levels)
    out = None
    for lvl in range(num_levels):
        f = roi_align(feats[lvl], rois, out_size=(roi_size, roi_size),
                      spatial_scale=1.0 / strides[lvl], sampling_ratio=2,
                      aligned=aligned, valid=valid)
        sel = (levels == lvl)[:, None, None, None]
        out = f * sel if out is None else out + f * sel
    return out


def extract_roi_feats_generic(feats: Sequence[jnp.ndarray],
                              rois: jnp.ndarray, valid: jnp.ndarray,
                              strides: Sequence[int], roi_size: int = 7,
                              aggregation: str = "sum") -> jnp.ndarray:
    """GenericRoIExtractor (``roi_extractors/generic_roi_extractor.py``,
    arXiv 2004.13665): every roi pools from ALL pyramid levels and the
    results are summed (or channel-concatenated) — no level assignment."""
    num_levels = min(len(feats), 4)
    outs = [roi_align(feats[lvl], rois, out_size=(roi_size, roi_size),
                      spatial_scale=1.0 / strides[lvl], sampling_ratio=2,
                      valid=valid)
            for lvl in range(num_levels)]
    if aggregation == "concat":
        return jnp.concatenate(outs, axis=-1)
    out = outs[0]
    for o in outs[1:]:
        out = out + o
    return out


def extract_roi_feats_deform(feats, flat_rois, valid, strides, roi_size,
                             offsets, gamma: float = 0.1):
    """Multi-level deformable RoI pooling: like :func:`extract_roi_feats`
    but each roi's assigned level is sampled with learned per-bin offsets
    (``ops/deform_roi_pool`` semantics)."""
    from dsl_tpu.ops.roi_align import deform_roi_align

    num_levels = min(len(feats), 4)
    levels = map_rois_to_levels(flat_rois[:, 1:5], num_levels)
    out = None
    for lvl in range(num_levels):
        f = deform_roi_align(feats[lvl], flat_rois, offsets,
                             out_size=(roi_size, roi_size),
                             spatial_scale=1.0 / strides[lvl],
                             sampling_ratio=2, gamma=gamma, valid=valid)
        sel = (levels == lvl)[:, None, None, None]
        out = f * sel if out is None else out + f * sel
    return out


def _extract_for_head(bbox_head, feats, flat_rois, valid, strides,
                      pack=None):
    """Level-assigned (default) or generic all-level extraction, chosen by
    the head's ``roi_extractor`` attribute. ``pack`` = (pack_apply,
    variables, pack_module) enables deformable RoI pooling: a plain pool
    feeds the offset predictor, then the features are re-pooled with the
    learned per-bin offsets (mmcv DeformRoIPoolPack forward)."""
    mode = getattr(bbox_head, "roi_extractor", "single")
    if mode in ("sum", "concat"):
        return extract_roi_feats_generic(feats, flat_rois, valid, strides,
                                         bbox_head.roi_size, aggregation=mode)
    base = extract_roi_feats(feats, flat_rois, valid, strides,
                             bbox_head.roi_size,
                             aligned=getattr(bbox_head, "roi_aligned", True))
    if pack is None:
        return base
    pack_apply, variables, pk = pack
    offsets, mask = pack_apply(variables, base)
    out = extract_roi_feats_deform(feats, flat_rois, valid, strides,
                                   bbox_head.roi_size, offsets,
                                   gamma=float(pk.gamma))
    return out if mask is None else out * mask


def resolve_rcnn_bbox_loss(cfg):
    """Reference bbox-head ``loss_bbox`` cfg → ``(fn, decoded)``.

    ``fn(pred, target, pos_weight, avg_factor)``; ``decoded`` means the
    IoU-family contract (reference ``reg_decoded_bbox=True``,
    ``bbox_head.py:72-76``): pred/target are decoded boxes, not deltas.
    Default (no cfg) is L1 — every reference two-stage config sets
    ``loss_bbox=dict(type='L1Loss')`` (``configs/_base_/models/
    faster_rcnn_r50_fpn.py:55``); unsupported types raise."""
    cfg = dict(cfg or {})
    t = cfg.get("type", "L1Loss")
    lw = float(cfg.get("loss_weight", 1.0))

    def _delta(base):
        return (lambda p, tg, w, af:
                lw * base(p, tg, weight=w[:, None], avg_factor=af)), False

    if t == "L1Loss":
        return _delta(L.l1_loss)
    if t == "SmoothL1Loss":
        beta = float(cfg.get("beta", 1.0))
        return (lambda p, tg, w, af: lw * L.smooth_l1_loss(
            p, tg, beta=beta, weight=w[:, None], avg_factor=af)), False
    if t == "BalancedL1Loss":
        beta = float(cfg.get("beta", 1.0))
        alpha = float(cfg.get("alpha", 0.5))
        gamma = float(cfg.get("gamma", 1.5))
        return (lambda p, tg, w, af: lw * L.balanced_l1_loss(
            p, tg, beta=beta, alpha=alpha, gamma=gamma, weight=w[:, None],
            avg_factor=af)), False
    if t == "MSELoss":
        return _delta(L.mse_loss)
    if t == "IoULoss":
        return (lambda p, tg, w, af:
                lw * L.iou_loss(p, tg, weight=w, avg_factor=af)), True
    if t == "GIoULoss":
        return (lambda p, tg, w, af:
                lw * L.giou_loss(p, tg, weight=w, avg_factor=af)), True
    if t == "DIoULoss":
        return (lambda p, tg, w, af:
                lw * L.diou_loss(p, tg, weight=w, avg_factor=af)), True
    if t == "CIoULoss":
        return (lambda p, tg, w, af:
                lw * L.ciou_loss(p, tg, weight=w, avg_factor=af)), True
    if t == "BoundedIoULoss":
        beta = float(cfg.get("beta", 0.2))
        return (lambda p, tg, w, af: lw * L.bounded_iou_loss(
            p, tg, beta=beta, weight=w[:, None], avg_factor=af)), True
    raise ValueError(f"unsupported rcnn loss_bbox type: {t}")


def sample_rois(key, proposals, prop_valid, gt_bboxes, gt_labels, gt_valid,
                num_classes: int, num_samples: int = 512,
                pos_fraction: float = 0.25, pos_iou_thr: float = 0.5,
                neg_iou_thr: float = 0.5, neg_hardness=None,
                pos_strategy: str = "random", neg_strategy: str = "random",
                min_pos_iou=0.5, match_low_quality: bool = False,
                add_gt_as_proposals: bool = True):
    """Fixed-shape RandomSampler: assign proposals (+gt boxes as extra
    candidates, mmdet ``add_gt_as_proposals``), then take ``num_samples`` by
    priority = (pos with random tiebreak first, capped at
    ``num_samples*pos_fraction``), negatives fill the rest.

    ``neg_hardness``: optional per-candidate score (higher = harder); when
    given, negatives are ranked hardest-first instead of randomly — the
    OHEMSampler (``mmdet/core/bbox/samplers/ohem_sampler.py``) / the
    ScoreHLRSampler's hard-negative ranking semantics.

    ``pos_strategy='instance_balanced'``: positives are taken round-robin
    across gt instances (``instance_balanced_pos_sampler.py:1-55``).
    ``neg_strategy='iou_balanced'``: negatives are taken round-robin across
    3 IoU bins in [0, neg_iou_thr) (``iou_balanced_neg_sampler.py:1-157``).
    ``CombinedSampler`` = both at once (``combined_sampler.py``)."""
    from dsl_tpu.core.pisa import group_rank_desc

    cand = jnp.concatenate([proposals, gt_bboxes], axis=0)
    gt_as_cand = gt_valid if add_gt_as_proposals \
        else jnp.zeros_like(gt_valid)
    cand_valid = jnp.concatenate([prop_valid, gt_as_cand], axis=0)
    # assignment runs over the PROPOSALS alone — the reference assigns
    # before the sampler appends gts (``base_sampler.py sample``:
    # ``assign_result.add_gt_``), so the match_low_quality rule forces
    # each gt's best PROPOSAL positive, and the gt rows are then their
    # own positives with overlap 1 (oracled in test_torch_oracle_rcnn).
    labels_p, assigned_p, weights_p, iou_p = _max_iou_assign_single(
        proposals, gt_bboxes, gt_labels, gt_valid,
        pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
        min_pos_iou=min_pos_iou, num_classes=num_classes,
        match_low_quality=match_low_quality)
    k = gt_bboxes.shape[0]
    labels_g = jnp.where(gt_as_cand, gt_labels,
                         num_classes).astype(labels_p.dtype)
    assigned_g = jnp.where(gt_as_cand, jnp.arange(k),
                           -1).astype(assigned_p.dtype)
    labels = jnp.concatenate([labels_p, labels_g], axis=0)
    assigned = jnp.concatenate([assigned_p, assigned_g], axis=0)
    max_iou = jnp.concatenate(
        [iou_p, jnp.where(gt_as_cand, 1.0, -1.0)], axis=0)
    # negatives = assigned-negative rows only: the neutral band between
    # neg_iou_thr and pos_iou_thr (weights 0) is never sampled
    neg_w = jnp.concatenate(
        [weights_p, jnp.zeros_like(gt_as_cand, jnp.float32)], axis=0)
    is_pos = (labels < num_classes) & cand_valid
    is_neg = (labels == num_classes) & (neg_w > 0) & cand_valid

    r = jax.random.uniform(key, (cand.shape[0],))
    if pos_strategy == "instance_balanced":
        # round-robin over gt instances: priority = within-instance rank
        rank = group_rank_desc(jnp.maximum(assigned, 0), r, is_pos)
        r = jnp.where(is_pos,
                      rank.astype(jnp.float32)
                      + r * 0.5, r)         # rank-major, random tiebreak
    if neg_strategy == "iou_balanced":
        num_bins = 3
        bins = jnp.clip((jnp.maximum(max_iou, 0.0) * num_bins
                         / max(neg_iou_thr, 1e-6)).astype(jnp.int32),
                        0, num_bins - 1)
        rank = group_rank_desc(bins, r, is_neg)
        r = jnp.where(is_neg, rank.astype(jnp.float32)
                      + bins.astype(jnp.float32) / (2 * num_bins), r)
    if neg_hardness is not None:
        # hardest negatives get the smallest in-band rank
        nh = jax.lax.stop_gradient(neg_hardness)
        r_neg = 1.0 - (nh - nh.min()) / jnp.maximum(nh.max() - nh.min(),
                                                    1e-12)
        r = jnp.where(is_neg, r_neg, r)
    max_pos = int(num_samples * pos_fraction)
    # rank positives first (in-band order), then negatives (in-band order);
    # invalid last. Cap positives by limiting their priority band size via
    # their in-band rank.
    pos_rank = jnp.where(is_pos, r, jnp.inf)
    pos_order = jnp.argsort(pos_rank)
    pos_within_cap = jnp.zeros_like(is_pos)
    pos_within_cap = pos_within_cap.at[pos_order[:max_pos]].set(True)
    pos_take = is_pos & pos_within_cap
    priority = jnp.where(pos_take, r,
                         jnp.where(is_neg, 1e6 + r, jnp.inf))
    order = jnp.argsort(priority)[:num_samples]
    out = (cand[order], labels[order], assigned[order],
           (pos_take | is_neg)[order], pos_take[order])
    if cand.shape[0] < num_samples:
        # fewer candidates than the sampler budget (the reference sampler
        # simply returns fewer rois; the fixed-shape contract pads with
        # invalid rows instead — valid=False excludes them from every loss)
        pad = num_samples - cand.shape[0]
        out = (jnp.concatenate([out[0], jnp.zeros((pad, 4), out[0].dtype)]),
               jnp.concatenate([out[1], jnp.full((pad,), num_classes,
                                                 out[1].dtype)]),
               jnp.concatenate([out[2], jnp.full((pad,), -1, out[2].dtype)]),
               jnp.concatenate([out[3], jnp.zeros((pad,), out[3].dtype)]),
               jnp.concatenate([out[4], jnp.zeros((pad,), out[4].dtype)]))
    return out


def sample_batch_rois(proposals, prop_valid, batch, rng_key, num_classes,
                      num_samples: int = 512, neg_hardness=None,
                      pos_iou_thr=0.5, neg_iou_thr=0.5,
                      min_pos_iou=0.5, match_low_quality: bool = False,
                      pos_fraction: float = 0.25,
                      add_gt_as_proposals: bool = True):
    """Batched fixed-shape roi sampling (shared by bbox + mask branches,
    as the reference's StandardRoIHead passes one ``sampling_results`` to
    both, ``standard_roi_head.py:180-266``). ``neg_hardness`` (B, P+K)
    enables OHEM negative mining. The IoU thresholds may be traced scalars
    (Dynamic R-CNN threads its live threshold through here). Defaults match
    the reference ``train_cfg.rcnn`` (``configs/_base_/models/
    faster_rcnn_r50_fpn.py:80-94``): pos/neg/min_pos 0.5,
    ``match_low_quality=False``, 1:3 pos fraction, gt added as
    candidates."""
    b = proposals.shape[0]
    keys = jax.random.split(rng_key, b)

    def per_image(key, props, pvalid, gtb, gtl, gtv, nh):
        return sample_rois(key, props, pvalid, gtb, gtl, gtv, num_classes,
                           num_samples=num_samples, neg_hardness=nh,
                           pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
                           min_pos_iou=min_pos_iou,
                           match_low_quality=match_low_quality,
                           pos_fraction=pos_fraction,
                           add_gt_as_proposals=add_gt_as_proposals)

    if neg_hardness is None:
        per = lambda key, props, pvalid, gtb, gtl, gtv: per_image(
            key, props, pvalid, gtb, gtl, gtv, None)
        rois, labels, assigned, valid, is_pos = jax.vmap(per)(
            keys, proposals, prop_valid, batch["gt_bboxes"],
            batch["gt_labels"], batch["gt_valid"])      # (B, S, ...)
    else:
        rois, labels, assigned, valid, is_pos = jax.vmap(per_image)(
            keys, proposals, prop_valid, batch["gt_bboxes"],
            batch["gt_labels"], batch["gt_valid"], neg_hardness)
    return dict(rois=rois, labels=labels, assigned=assigned, valid=valid,
                is_pos=is_pos)


def ohem_hardness(bbox_head, apply_fn, variables, feats, proposals,
                  prop_valid, batch, strides=(4, 8, 16, 32)):
    """Per-candidate classification loss under the CURRENT head — the OHEM
    ranking signal (reference ``ohem_sampler.py hard_mining``: runs the bbox
    head on the candidates and ranks by loss). Candidates = proposals + the
    gt-augmented rows, matching ``sample_rois``."""
    b, p = proposals.shape[:2]
    cand = jnp.concatenate([proposals, batch["gt_bboxes"]], axis=1)
    cand_valid = jnp.concatenate(
        [prop_valid, batch["gt_valid"]], axis=1)
    n = cand.shape[1]
    batch_idx = jnp.broadcast_to(
        jnp.arange(b)[:, None], (b, n)).reshape(-1, 1)
    flat = jnp.concatenate(
        [batch_idx.astype(jnp.float32), cand.reshape(-1, 4)], axis=1)
    roi_feats = extract_roi_feats(feats, flat, cand_valid.reshape(-1),
                                  strides, bbox_head.roi_size)
    cls_logits, _ = apply_fn(variables, roi_feats)
    nc = bbox_head.num_classes
    # negatives' loss = CE against background
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    loss_bg = -logp[:, nc].reshape(b, n)
    return jax.lax.stop_gradient(loss_bg)


def _apply_bbox_head(bbox_head, apply_fn, variables, feats, flat_rois,
                     valid, strides, roi_feats):
    """Run the bbox head. Double-Head heads additionally receive features
    extracted at ``reg_roi_scale_factor``-scaled rois
    (``double_roi_head.py:16-33``)."""
    rsf = getattr(bbox_head, "reg_roi_scale_factor", None)
    if rsf is None:
        return apply_fn(variables, roi_feats)
    from dsl_tpu.models.roi_heads.double_bbox_head import scale_rois

    scaled = jnp.concatenate(
        [flat_rois[:, :1], scale_rois(flat_rois[:, 1:5], rsf)], axis=1)
    reg_feats = extract_roi_feats(feats, scaled, valid, strides,
                                  bbox_head.roi_size)
    return apply_fn(variables, roi_feats, reg_feats)


def roi_head_loss(bbox_head: Shared2FCBBoxHead, apply_fn, variables, feats,
                  proposals, prop_valid, batch, rng_key,
                  strides=(4, 8, 16, 32), num_samples: int = 512,
                  samples: dict | None = None, pack=None):
    """Sample rois, extract features, run the bbox head, compute losses.

    apply_fn: ``lambda variables, roi_feats: (cls, reg)`` — the bound module
    apply for the bbox head submodule.
    """
    nc = bbox_head.num_classes
    b = proposals.shape[0]
    if samples is None:
        samples = sample_batch_rois(proposals, prop_valid, batch, rng_key,
                                    nc, num_samples=num_samples)
    rois, labels, assigned, valid, is_pos = (
        samples["rois"], samples["labels"], samples["assigned"],
        samples["valid"], samples["is_pos"])

    batch_idx = jnp.broadcast_to(
        jnp.arange(b)[:, None], (b, num_samples)).reshape(-1, 1)
    flat_rois = jnp.concatenate(
        [batch_idx.astype(jnp.float32), rois.reshape(-1, 4)], axis=1)
    roi_feats = _extract_for_head(bbox_head, feats, flat_rois,
                                  valid.reshape(-1), strides, pack=pack)
    if hasattr(bbox_head, "num_buckets"):               # SABL roi head
        from dsl_tpu.models.roi_heads.sabl_head import sabl_roi_loss

        cls_logits, bucket_preds = apply_fn(variables, roi_feats)
        return sabl_roi_loss(bbox_head, cls_logits, bucket_preds, samples,
                             batch, num_samples)
    cls_logits, reg = _apply_bbox_head(
        bbox_head, apply_fn, variables, feats, flat_rois, valid.reshape(-1),
        strides, roi_feats)                             # (BS, C+1), (BS, C*4)
    return rcnn_bbox_loss(bbox_head, cls_logits, reg, samples, batch)


def select_reg_deltas(bbox_head, reg, labels):
    """Pick each roi's regressed 4-vector: class-specific heads gather the
    assigned class's deltas; class-agnostic heads (cascade stages,
    reference ``reg_class_agnostic=True``) emit 4 directly."""
    nc = bbox_head.num_classes
    if getattr(bbox_head, "reg_class_agnostic", False):
        return reg.reshape(-1, 4)
    reg = reg.reshape(-1, nc, 4)
    cls_idx = jnp.clip(labels, 0, nc - 1)
    return jnp.take_along_axis(
        reg, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]


def rcnn_bbox_loss(bbox_head, cls_logits, reg, samples, batch):
    """Pure bbox-head loss math on sampled rois — the torch-oracle surface.

    Reference ``bbox_head.py get_targets + loss`` (:255-311): CE over C+1
    averaged by the number of sampled rois; regression on positives only,
    ALSO averaged by the number of sampled rois (``avg_factor=
    bbox_targets.size(0)`` :302 — num pos+neg, NOT num_pos); loss type from
    the head's ``loss_bbox`` cfg (L1 default; IoU-family losses compare
    decoded boxes, ``reg_decoded_bbox`` semantics)."""
    nc = bbox_head.num_classes
    rois, labels, assigned = (samples["rois"], samples["labels"],
                              samples["assigned"])
    flat_labels = labels.reshape(-1)
    flat_valid = samples["valid"].reshape(-1).astype(jnp.float32)
    flat_pos = samples["is_pos"].reshape(-1).astype(jnp.float32)
    num_valid = jnp.maximum(jnp.sum(flat_valid), 1.0)

    cls_cfg = dict(getattr(bbox_head, "loss_cls", None) or {})
    if cls_cfg.get("type") == "SeesawLoss":
        # running per-class counts arrive as traced state
        # (``batch['cum_samples']``, host-maintained via SeesawCounter)
        cum = batch.get("cum_samples", jnp.ones((nc + 1,), jnp.float32))
        loss_cls, loss_obj, _ = L.seesaw_loss(
            cls_logits, flat_labels, cum, nc,
            p=float(cls_cfg.get("p", 0.8)), q=float(cls_cfg.get("q", 2.0)),
            weight=flat_valid, avg_factor=num_valid)
    else:
        loss_obj = None
        loss_cls = float(cls_cfg.get("loss_weight", 1.0)) * L.cross_entropy(
            cls_logits, flat_labels, weight=flat_valid, avg_factor=num_valid)
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None],
        axis=1).reshape(-1, 4)
    reg_sel = select_reg_deltas(bbox_head, reg, flat_labels)
    loss_fn, decoded = resolve_rcnn_bbox_loss(
        getattr(bbox_head, "loss_bbox", None))
    decoded = decoded or getattr(bbox_head, "reg_decoded_bbox", False)
    enc, dec, cd_means, cd_stds = resolve_delta_coder(
        getattr(bbox_head, "bbox_coder", None),
        bbox_head.target_means, bbox_head.target_stds)
    if decoded:
        pred_boxes = dec(rois.reshape(-1, 4), reg_sel, cd_means, cd_stds)
        loss_reg = loss_fn(pred_boxes, gt, flat_pos, num_valid)
    else:
        tgt = enc(rois.reshape(-1, 4), gt, cd_means, cd_stds)
        loss_reg = loss_fn(reg_sel, tgt, flat_pos, num_valid)
    acc = jnp.sum((jnp.argmax(cls_logits, -1) == flat_labels) * flat_valid) \
        / num_valid
    out = dict(loss_cls=loss_cls, acc=acc)
    if loss_obj is not None:
        out["loss_cls_objectness"] = loss_obj
    if getattr(bbox_head, "with_reg", True):
        out["loss_bbox"] = loss_reg
    return out


def roi_head_predict(bbox_head: Shared2FCBBoxHead, apply_fn, variables,
                     feats, proposals, prop_valid, img_shapes=None,
                     scale_factors=None, strides=(4, 8, 16, 32),
                     score_thr: float = 0.05, iou_threshold: float = 0.5,
                     max_per_img: int = 100, pack=None,
                     nms_cfg: dict | None = None):
    nc = bbox_head.num_classes
    b, p = proposals.shape[:2]
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, p)).reshape(-1, 1)
    flat_rois = jnp.concatenate(
        [batch_idx.astype(jnp.float32), proposals.reshape(-1, 4)], axis=1)
    roi_feats = _extract_for_head(bbox_head, feats, flat_rois,
                                  prop_valid.reshape(-1), strides, pack=pack)
    if hasattr(bbox_head, "num_buckets"):               # SABL roi head
        from dsl_tpu.models.roi_heads.sabl_head import sabl_roi_predict

        cls_logits, bucket_preds = apply_fn(variables, roi_feats)
        return sabl_roi_predict(
            bbox_head, cls_logits, bucket_preds, proposals, prop_valid,
            img_shapes=img_shapes, scale_factors=scale_factors,
            score_thr=score_thr, iou_threshold=iou_threshold,
            max_per_img=max_per_img)
    cls_logits, reg = _apply_bbox_head(
        bbox_head, apply_fn, variables, feats, flat_rois,
        prop_valid.reshape(-1), strides, roi_feats)
    return rcnn_decode_nms(bbox_head, cls_logits, reg, proposals, prop_valid,
                           img_shapes=img_shapes,
                           scale_factors=scale_factors, score_thr=score_thr,
                           iou_threshold=iou_threshold,
                           max_per_img=max_per_img, nms_cfg=nms_cfg)


def rcnn_decode_nms(bbox_head, cls_logits, reg, proposals, prop_valid,
                    img_shapes=None, scale_factors=None,
                    score_thr: float = 0.05, iou_threshold: float = 0.5,
                    max_per_img: int = 100, nms_cfg: dict | None = None):
    """RoI bbox decode + NMS (reference ``BBoxHead.get_bboxes``): softmax
    over C+1, per-class (or class-agnostic) delta decode from the
    proposals, clip to img_shape, rescale, multiclass NMS.

    cls_logits (B*P, C+1[, +C seesaw]); reg (B*P, 4C|4);
    proposals (B, P, 4); prop_valid (B, P)."""
    nc = bbox_head.num_classes
    b, p = proposals.shape[:2]
    if dict(getattr(bbox_head, "loss_cls", None) or {}).get("type") \
            == "SeesawLoss":
        # split-head activation (``seesaw_loss.py get_activation:156-174``):
        # class softmax scaled by the positive-objectness probability
        sc = jax.nn.softmax(cls_logits[:, :nc], -1)
        obj = jax.nn.softmax(cls_logits[:, nc:], -1)
        scores = (sc * obj[:, 0:1]).reshape(b, p, nc)
    else:
        scores = jax.nn.softmax(cls_logits, -1)[:, :nc].reshape(b, p, nc)
    if getattr(bbox_head, "with_reg", True):
        if getattr(bbox_head, "reg_class_agnostic", False):
            reg_pc = jnp.broadcast_to(reg.reshape(-1, 1, 4),
                                      (b * p, nc, 4))
        else:
            reg_pc = reg.reshape(-1, nc, 4)
        _, dec, cd_means, cd_stds = resolve_delta_coder(
            getattr(bbox_head, "bbox_coder", None),
            bbox_head.target_means, bbox_head.target_stds)
        boxes = dec(
            proposals.reshape(-1, 4)[:, None, :].repeat(nc, 1),
            reg_pc, cd_means, cd_stds).reshape(b, p, nc, 4)
    else:                        # Grid R-CNN: proposals are the boxes
        boxes = jnp.broadcast_to(proposals[:, :, None, :], (b, p, nc, 4))
    if img_shapes is not None:
        xlim = img_shapes[:, None, None, 1:2]
        ylim = img_shapes[:, None, None, 0:1]
        boxes = jnp.concatenate(
            [jnp.clip(boxes[..., 0:1], 0, xlim),
             jnp.clip(boxes[..., 1:2], 0, ylim),
             jnp.clip(boxes[..., 2:3], 0, xlim),
             jnp.clip(boxes[..., 3:4], 0, ylim)], axis=-1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, None, :]

    ncfg = dict(nms_cfg or {})
    t = ncfg.get("type", "nms")
    if t not in ("nms", "soft_nms"):
        raise ValueError(f"unsupported rcnn nms type: {t}")
    nms_type = ("soft_nms_gaussian" if t == "soft_nms"
                and ncfg.get("method") == "gaussian"
                else "soft_nms" if t == "soft_nms" else "nms")

    def _single(bx, sc, vd):
        return multiclass_nms(
            bx, sc, score_thr=score_thr,
            iou_threshold=float(ncfg.get("iou_threshold", iou_threshold)),
            max_per_img=max_per_img, valid=vd, nms_type=nms_type,
            sigma=float(ncfg.get("sigma", 0.5)),
            min_score=float(ncfg.get("min_score", 1e-3)))

    return jax.vmap(_single)(boxes, scores, prop_valid)
