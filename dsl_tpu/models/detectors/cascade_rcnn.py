"""Cascade R-CNN: iterative RoI refinement with rising IoU thresholds.

Parity with ``/root/reference/mmdet/models/roi_heads/cascade_roi_head.py`` +
``detectors/cascade_rcnn.py``: three bbox-head stages trained at IoU
(0.5, 0.6, 0.7) with per-stage loss weights (1, 0.5, 0.25); each stage
re-assigns the previous stage's decoded boxes; inference averages the class
scores over stages and decodes through the cascade. Everything fixed-shape:
the proposal set keeps its static capacity through every stage.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import DETECTORS, MODELS, build_from_cfg
from dsl_tpu.core.boxes import delta2bbox
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.dense_heads.rpn_head import rpn_loss, rpn_proposals
from dsl_tpu.models.roi_heads.standard_roi_head import (
    extract_roi_feats, roi_head_loss)
from dsl_tpu.models.detectors.single_stage import _parse_losses

CASCADE_IOUS = (0.5, 0.6, 0.7)
CASCADE_WEIGHTS = (1.0, 0.5, 0.25)
CASCADE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
                (0.033, 0.033, 0.067, 0.067))


@DETECTORS.register
class CascadeRCNN(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module
    bbox_heads: Sequence[nn.Module]      # one Shared2FCBBoxHead per stage
    mask_head: nn.Module = None          # Cascade Mask R-CNN when set
    train_cfg: Any = None
    test_cfg: Any = None
    # reference ``_base_/models/cascade_rcnn_r50_fpn.py`` roi_head
    # ``stage_loss_weights=[1, 0.5, 0.25]`` + the per-stage assigner IoU
    # ladder from train_cfg.rcnn — config-read (model-dict keys), defaults
    # to the reference values.
    stage_loss_weights: Sequence[float] = CASCADE_WEIGHTS
    stage_ious: Sequence[float] = CASCADE_IOUS

    def extract_feat(self, images):
        feats = self.backbone(images)
        if type(self.neck).__name__ == "RFP":
            # DetectoRS-HTC/Cascade: the RFP neck reruns its own backbone
            # copy recursively and needs the input image (two_stage.py
            # DetectoRS.extract_feat contract)
            return self.neck((images,) + tuple(feats))
        return self.neck(feats)

    def __call__(self, images, training: bool = False):
        feats = self.extract_feat(images)
        return feats, self.rpn_head(feats, training=training)

    def roi_forward(self, roi_feats, stage: int = 0):
        return self.bbox_heads[stage](roi_feats)

    def mask_forward(self, roi_feats):
        return self.mask_head(roi_feats)


def build_cascade_rcnn(cfg: dict) -> CascadeRCNN:
    cfg = dict(cfg)
    det_type = cfg.pop("type", "CascadeRCNN")
    backbone = build_from_cfg(cfg.pop("backbone"), MODELS)
    neck = build_from_cfg(cfg.pop("neck"), MODELS)
    rpn = build_from_cfg(cfg.pop("rpn_head"), MODELS)
    head_cfgs = cfg.pop("bbox_heads")
    heads = []
    for c in head_cfgs:
        c = dict(c)
        if str(c.get("type", "")).startswith("Shared"):
            # reference cascade stages: class-agnostic reg + SmoothL1
            # (``cascade_rcnn_r50_fpn.py`` bbox_head entries)
            c.setdefault("reg_class_agnostic", True)
            c.setdefault("loss_bbox", dict(type="SmoothL1Loss", beta=1.0))
        heads.append(build_from_cfg(c, MODELS))
    heads = tuple(heads)
    mask_cfg = cfg.pop("mask_head", None)
    mask_head = build_from_cfg(mask_cfg, MODELS) if mask_cfg else None
    n_stages = len(heads)
    common = dict(
        stage_loss_weights=tuple(
            cfg.pop("stage_loss_weights", CASCADE_WEIGHTS[:n_stages])),
        stage_ious=tuple(cfg.pop("stage_ious", CASCADE_IOUS[:n_stages])),
        test_cfg=cfg.pop("test_cfg", None),
        train_cfg=cfg.pop("train_cfg", None))
    if len(common["stage_loss_weights"]) != n_stages or \
            len(common["stage_ious"]) != n_stages:
        raise ValueError(
            f"stage_loss_weights/stage_ious must have {n_stages} entries")
    if det_type == "SCNet":
        return SCNet(backbone=backbone, neck=neck, rpn_head=rpn,
                     bbox_heads=heads, mask_head=mask_head,
                     semantic_head=build_from_cfg(cfg.pop("semantic_head"),
                                                  MODELS),
                     glbctx_head=build_from_cfg(cfg.pop("glbctx_head"),
                                                MODELS),
                     relay_head=build_from_cfg(cfg.pop("relay_head"),
                                               MODELS),
                     **common)
    if det_type in ("HybridTaskCascade", "HTC") or "mask_heads" in cfg:
        # route by config shape too: DetectoRS-HTC keeps type='DetectoRS'
        # but carries the HTC head lists (reference detectors_htc configs)
        mask_heads = tuple(build_from_cfg(dict(c), MODELS)
                           for c in cfg.pop("mask_heads"))
        sem_cfg = cfg.pop("semantic_head", None)
        semantic = build_from_cfg(sem_cfg, MODELS) if sem_cfg else None
        return HTC(backbone=backbone, neck=neck, rpn_head=rpn,
                   bbox_heads=heads, mask_heads=mask_heads,
                   semantic_head=semantic, **common)
    return CascadeRCNN(backbone=backbone, neck=neck, rpn_head=rpn,
                      bbox_heads=heads, mask_head=mask_head, **common)


def _decode_stage(head, proposals, reg, labels=None):
    """Decode one stage's refinement (class-agnostic 4-vector — the
    reference cascade contract — else class-mean / class-specific).
    SABL stages (``sabl_cascade_rcnn``) decode through the bucketing
    coder instead."""
    from dsl_tpu.core.boxes import resolve_delta_coder

    if hasattr(head, "num_buckets"):        # SABLHead: reg = (bcls, boff)
        from dsl_tpu.core.bucket_coder import bucket2bbox

        b, p = proposals.shape[:2]
        bcls, boff = reg
        boxes, _ = bucket2bbox(proposals.reshape(-1, 4), bcls, boff,
                               head.num_buckets, head.scale_factor)
        return boxes.reshape(b, p, 4)

    _, dec, cd_means, cd_stds = resolve_delta_coder(
        getattr(head, "bbox_coder", None),
        head.target_means, head.target_stds)
    nc = head.num_classes
    b, p = proposals.shape[:2]
    if getattr(head, "reg_class_agnostic", False):
        return dec(proposals, reg.reshape(b, p, 4), cd_means, cd_stds)
    reg = reg.reshape(b, p, nc, 4)
    if labels is None:
        reg_sel = reg.mean(axis=2)
    else:
        reg_sel = jnp.take_along_axis(
            reg, labels[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    return dec(proposals, reg_sel, cd_means, cd_stds)


def _stage_rcnn_kw(detector, stage: int, num_samples: int | None):
    """Per-stage sampling knobs. ``train_cfg['rcnn']`` may be a list — the
    reference cascade schema (``cascade_rcnn_r50_fpn.py:120-165``: stage
    IoU ladder 0.5/0.6/0.7 with ``min_pos_iou`` = the stage IoU and
    ``match_low_quality=False``) — or a single dict; the defaults encode
    the ladder."""
    from dsl_tpu.models.detectors.two_stage import parse_rcnn_train_cfg

    tc = dict(detector.train_cfg or {})
    rc = tc.get("rcnn")
    if isinstance(rc, (list, tuple)):
        kw = parse_rcnn_train_cfg(None, stage_cfg=rc[stage])
    elif rc is not None:
        kw = parse_rcnn_train_cfg(tc)
    else:
        iou = detector.stage_ious[stage]
        kw = dict(num_samples=512, pos_fraction=0.25,
                  add_gt_as_proposals=True, pos_iou_thr=iou,
                  neg_iou_thr=iou, min_pos_iou=iou,
                  match_low_quality=False)
    if num_samples is not None:
        kw["num_samples"] = num_samples
    return kw


def _cascade_rpn_losses(detector, rpn_scores, rpn_deltas, batch, rng_key):
    tc = dict(detector.train_cfg or {})
    return rpn_loss(detector.rpn_head, rpn_scores, rpn_deltas, batch,
                    train_cfg=dict(tc.get("rpn", {}) or {}),
                    rng_key=jax.random.fold_in(rng_key, 97))


def cascade_rcnn_loss(detector, variables, batch, rng_key=None,
                      num_proposals: int = 512, num_samples: int = 256):
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, batch["images"], training=True)
    losses = _cascade_rpn_losses(detector, rpn_scores, rpn_deltas, batch,
                                 rng_key)

    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas,
        img_shapes=batch.get("img_shapes"), nms_pre=num_proposals,
        num_proposals=num_proposals)
    proposals = jax.lax.stop_gradient(proposals)
    strides = tuple(detector.rpn_head.strides)[:4]

    from dsl_tpu.models.roi_heads.standard_roi_head import sample_batch_rois

    keys = jax.random.split(rng_key, len(detector.bbox_heads))
    for stage, head in enumerate(detector.bbox_heads):
        def roi_apply(v, rf, _stage=stage):
            return detector.apply(v, rf, _stage,
                                  method=detector.roi_forward)

        samples = sample_batch_rois(
            proposals, prop_valid, batch, keys[stage], head.num_classes,
            **_stage_rcnn_kw(detector, stage, num_samples))
        stage_losses = roi_head_loss(
            head, roi_apply, variables, feats, proposals, prop_valid,
            batch, keys[stage], strides=strides, num_samples=num_samples,
            samples=samples)
        if detector.mask_head is not None and "gt_mask_crops" in batch:
            # per-stage mask loss with the shared mask head (Cascade Mask
            # R-CNN; the reference keeps one mask head per stage — shared
            # parameters here, same loss schedule)
            from dsl_tpu.models.detectors.two_stage import _mask_branch_loss

            lm, _, _ = _mask_branch_loss(detector, variables, feats, samples,
                                         batch, num_samples=num_samples)
            losses[f"s{stage}.loss_mask"] = (
                lm * detector.stage_loss_weights[stage])
        w = detector.stage_loss_weights[stage]
        for k, v in stage_losses.items():
            key = f"s{stage}.{k}"
            losses[key] = v * w if "loss" in k else v
        if stage < len(detector.bbox_heads) - 1:
            # refine proposals for the next stage (class-agnostic mean reg)
            b, p = proposals.shape[:2]
            batch_idx = jnp.broadcast_to(
                jnp.arange(b)[:, None], (b, p)).reshape(-1, 1)
            flat = jnp.concatenate(
                [batch_idx.astype(jnp.float32), proposals.reshape(-1, 4)], 1)
            rfeats = extract_roi_feats(feats, flat, prop_valid.reshape(-1),
                                       strides, head.roi_size)
            _, reg = roi_apply(variables, rfeats)
            proposals = jax.lax.stop_gradient(
                _decode_stage(head, proposals, reg))
    return _parse_losses(losses)


def cascade_decode_nms(heads, stage_fn, proposals, prop_valid,
                       img_shapes=None, scale_factors=None, test_cfg=None):
    """Multi-stage cascade box decode + NMS (reference
    ``cascade_roi_head.py simple_test:282-371``): each stage's RAW cls
    logits accumulate and softmax applies ONCE to the stage mean
    (softmax(mean logits) != mean(softmax) — the reference averages
    ``ms_scores`` BEFORE ``get_bboxes`` activates them); intermediate
    stages refine rois by the argmax class (``bbox_head.py
    regress_by_class:454-483``, clipped to img_shape); the final stage
    decodes per-class through ``get_bboxes`` semantics
    (``rcnn_decode_nms``). SABL stages (``sabl_head.py
    get_bboxes:472-509``) decode through the bucketing coder and pass
    ONLY the last stage's bucketing confidence to multiclass NMS as a
    ``score_factor`` (threshold the raw averaged score, THEN multiply).

    ``stage_fn(stage, proposals[B,P,4]) -> (cls_logits (B*P, C+1[, +C]),
    reg)`` is the roi-extract + head forward for one stage.
    """
    tc = dict(test_cfg or {})
    rcnn = dict(tc.get("rcnn", tc) or {})
    nms_cfg = dict(rcnn.get("nms", {}) or {})
    score_thr = float(rcnn.get("score_thr", 0.05))
    max_per_img = int(rcnn.get("max_per_img", 100))
    iou_thr = float(nms_cfg.get("iou_threshold", 0.5))
    b, p = proposals.shape[:2]
    n_stages = len(heads)
    logits_sum = None
    reg = None
    for stage, head in enumerate(heads):
        cls_logits, reg = stage_fn(stage, proposals)
        logits_sum = cls_logits if logits_sum is None \
            else logits_sum + cls_logits
        if stage < n_stages - 1:
            nc = head.num_classes
            labels = jnp.argmax(cls_logits[:, :nc], -1).reshape(b, p)
            proposals = _decode_stage(head, proposals, reg, labels=labels)
            if img_shapes is not None:
                xlim = img_shapes[:, None, 1:2]
                ylim = img_shapes[:, None, 0:1]
                proposals = jnp.concatenate(
                    [jnp.clip(proposals[..., 0:1], 0, xlim),
                     jnp.clip(proposals[..., 1:2], 0, ylim),
                     jnp.clip(proposals[..., 2:3], 0, xlim),
                     jnp.clip(proposals[..., 3:4], 0, ylim)], axis=-1)
    mean_logits = logits_sum / float(n_stages)
    last = heads[-1]
    if hasattr(last, "num_buckets"):
        from dsl_tpu.core.bucket_coder import bucket2bbox

        bcls, boff = reg
        boxes, conf = bucket2bbox(proposals.reshape(-1, 4), bcls, boff,
                                  last.num_buckets, last.scale_factor)
        boxes = boxes.reshape(b, p, 4)
        conf = conf.reshape(b, p)
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
        nc = last.num_classes
        scores = jax.nn.softmax(mean_logits, -1)[:, :nc].reshape(b, p, nc)

        def _single(bx, sc, cf, vd):
            return multiclass_nms(bx, sc, score_thr=score_thr,
                                  iou_threshold=iou_thr,
                                  max_per_img=max_per_img, valid=vd,
                                  score_factors=cf)

        return jax.vmap(_single)(boxes, scores, conf, prop_valid)
    from dsl_tpu.models.roi_heads.standard_roi_head import rcnn_decode_nms

    return rcnn_decode_nms(last, mean_logits, reg, proposals, prop_valid,
                           img_shapes=img_shapes,
                           scale_factors=scale_factors,
                           score_thr=score_thr, iou_threshold=iou_thr,
                           max_per_img=max_per_img, nms_cfg=nms_cfg)


def cascade_rcnn_predict(detector, variables, images, img_shapes=None,
                         scale_factors=None, test_cfg=None,
                         num_proposals: int = 1000):
    tc = dict(test_cfg or detector.test_cfg or {})
    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, images, training=False)
    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas, img_shapes=img_shapes,
        nms_pre=num_proposals, num_proposals=num_proposals)
    strides = tuple(detector.rpn_head.strides)[:4]
    b, p = proposals.shape[:2]
    batch_idx = jnp.broadcast_to(
        jnp.arange(b)[:, None], (b, p)).reshape(-1, 1).astype(jnp.float32)

    def stage_fn(stage, props):
        flat = jnp.concatenate([batch_idx, props.reshape(-1, 4)], 1)
        rfeats = extract_roi_feats(feats, flat, prop_valid.reshape(-1),
                                   strides,
                                   detector.bbox_heads[stage].roi_size)
        return detector.apply(variables, rfeats, stage,
                              method=detector.roi_forward)

    return cascade_decode_nms(detector.bbox_heads, stage_fn, proposals,
                              prop_valid, img_shapes=img_shapes,
                              scale_factors=scale_factors, test_cfg=tc)


# ---------------------------------------------------------------------------
# HTC — Hybrid Task Cascade (reference mmdet/models/roi_heads/htc_roi_head.py
# :1-606 + detectors/htc.py): cascade + per-stage mask heads with mask info
# flow, a fused semantic branch whose roi features are added to both bbox and
# mask roi features, and stage-averaged mask probs at test.
# ---------------------------------------------------------------------------


@DETECTORS.register
class HTC(CascadeRCNN):
    mask_heads: Sequence[nn.Module] = None     # one HTCMaskHead per stage
    semantic_head: nn.Module = None

    def semantic_forward(self, feats):
        return self.semantic_head(feats)

    def htc_mask_forward(self, roi_feats, stage: int, res_feat=None):
        return self.mask_heads[stage](roi_feats, res_feat)


def _semantic_roi_feats(semantic_feat, flat_rois, valid, roi_size,
                        stride: int = 8):
    """RoI-align the semantic embedding at the semantic-branch stride;
    0 when the detector has no semantic head (htc_without_semantic)
    (reference ``htc_roi_head.py _bbox_forward``: fixed stride-8 extract)."""
    from dsl_tpu.ops.roi_align import roi_align

    if semantic_feat is None:
        return 0.0
    return roi_align(semantic_feat, flat_rois, out_size=(roi_size, roi_size),
                     spatial_scale=1.0 / stride, sampling_ratio=2,
                     valid=valid)


def _htc_semantic_target(detector, batch, seg_hw):
    """Semantic target: ``gt_semantic_seg`` when the batch carries one
    (COCO-stuff parity); otherwise a thing-class union built from the
    instance mask crops (documented deviation — the DSL data layer has no
    stuff annotations)."""
    import jax.numpy as jnp

    if "gt_semantic_seg" in batch:
        return batch["gt_semantic_seg"]
    from dsl_tpu.models.dense_heads.yolact_head import paste_gt_crops

    b = batch["images"].shape[0]
    img_hw = (batch["images"].shape[1], batch["images"].shape[2])
    pasted = jax.vmap(paste_gt_crops, in_axes=(0, 0, 0, None, None))(
        batch["gt_mask_crops"], batch["gt_bboxes"], batch["gt_valid"],
        seg_hw, img_hw)                                   # (B, K, h, w)
    occ = pasted > 0.5
    nc = detector.semantic_head.num_classes
    # label = 1 + instance class where occupied (0 = background)
    lbl = jnp.clip(batch["gt_labels"] + 1, 0, nc - 1)[:, :, None, None]
    per_gt = jnp.where(occ, lbl, 0)
    return per_gt.max(axis=1)                             # (B, h, w)


def htc_loss(detector, variables, batch, rng_key=None,
             num_proposals: int = 512, num_samples: int = 256):
    """Cascade bbox stages with semantic fusion + per-stage mask losses with
    info flow + semantic segmentation loss (reference ``htc_roi_head.py
    forward_train`` :250-360)."""
    from dsl_tpu.models.roi_heads.htc import semantic_seg_loss
    from dsl_tpu.models.roi_heads.mask_head import (
        mask_head_loss, mask_targets_from_crops, select_positive_rois)
    from dsl_tpu.models.roi_heads.standard_roi_head import sample_batch_rois

    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, batch["images"], training=True)
    losses = _cascade_rpn_losses(detector, rpn_scores, rpn_deltas, batch,
                                 rng_key)

    if detector.semantic_head is not None:
        seg_logits, semantic_feat = detector.apply(
            variables, feats, method=detector.semantic_forward)
        seg_t = _htc_semantic_target(detector, batch, seg_logits.shape[1:3])
        losses["loss_semantic_seg"] = semantic_seg_loss(
            seg_logits, seg_t,
            loss_weight=detector.semantic_head.loss_weight)
    else:                        # htc_without_semantic_r50_fpn_1x_coco
        semantic_feat = None

    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas,
        img_shapes=batch.get("img_shapes"), nms_pre=num_proposals,
        num_proposals=num_proposals)
    proposals = jax.lax.stop_gradient(proposals)
    strides = tuple(detector.rpn_head.strides)[:4]

    keys = jax.random.split(rng_key, len(detector.bbox_heads))
    for stage, head in enumerate(detector.bbox_heads):
        w = detector.stage_loss_weights[stage]

        def roi_apply(v, rf, _stage=stage):
            return detector.apply(v, rf, _stage,
                                  method=detector.roi_forward)

        samples = sample_batch_rois(
            proposals, prop_valid, batch, keys[stage], head.num_classes,
            **_stage_rcnn_kw(detector, stage, num_samples))

        # ---- bbox stage with semantic fusion ----
        b = proposals.shape[0]
        rois, valid = samples["rois"], samples["valid"]
        batch_idx = jnp.broadcast_to(
            jnp.arange(b)[:, None], (b, num_samples)).reshape(-1, 1)
        flat = jnp.concatenate(
            [batch_idx.astype(jnp.float32), rois.reshape(-1, 4)], axis=1)
        rfeats = extract_roi_feats(feats, flat, valid.reshape(-1), strides,
                                   head.roi_size)
        rfeats = rfeats + _semantic_roi_feats(
            semantic_feat, flat, valid.reshape(-1), head.roi_size)
        cls_logits, reg = roi_apply(variables, rfeats)

        from dsl_tpu.models.roi_heads.standard_roi_head import rcnn_bbox_loss

        stage_out = rcnn_bbox_loss(head, cls_logits, reg, samples, batch)
        losses[f"s{stage}.loss_cls"] = w * stage_out["loss_cls"]
        losses[f"s{stage}.loss_bbox"] = w * stage_out["loss_bbox"]

        # ---- mask stage with info flow ----
        if detector.mask_heads is not None and "gt_mask_crops" in batch:
            mh = detector.mask_heads[stage]
            max_pos = max(1, num_samples // 4)
            prois, plabels, passigned, ppos = select_positive_rois(
                samples["rois"], samples["labels"], samples["assigned"],
                samples["is_pos"], max_pos)
            pidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, max_pos))
            pflat = jnp.concatenate(
                [pidx.reshape(-1, 1).astype(jnp.float32),
                 prois.reshape(-1, 4)], axis=1)
            pvalid = ppos.reshape(-1)
            mfeats = extract_roi_feats(feats, pflat, pvalid, strides,
                                       mh.roi_size)
            mfeats = mfeats + _semantic_roi_feats(
                semantic_feat, pflat, pvalid, mh.roi_size)
            res_feat = None
            logits = None
            for j in range(stage + 1):    # info flow through earlier heads
                logits, res_feat = detector.apply(
                    variables, mfeats, j, res_feat,
                    method=detector.htc_mask_forward)
            targets = mask_targets_from_crops(
                batch["gt_mask_crops"], batch["gt_bboxes"],
                prois.reshape(-1, 4), pidx.reshape(-1),
                passigned.reshape(-1), mask_size=logits.shape[1])
            losses[f"s{stage}.loss_mask"] = w * mask_head_loss(
                logits, targets, plabels.reshape(-1),
                pvalid.astype(jnp.float32), mh.num_classes)

        if stage < len(detector.bbox_heads) - 1:
            _, reg_all = roi_apply(variables, extract_roi_feats(
                feats, jnp.concatenate(
                    [jnp.broadcast_to(
                        jnp.arange(b)[:, None],
                        (b, proposals.shape[1])).reshape(-1, 1).astype(
                            jnp.float32),
                     proposals.reshape(-1, 4)], axis=1),
                prop_valid.reshape(-1), strides, head.roi_size))
            proposals = jax.lax.stop_gradient(
                _decode_stage(head, proposals, reg_all))
    return _parse_losses(losses)


def htc_predict(detector, variables, images, img_shapes=None,
                scale_factors=None, test_cfg=None,
                num_proposals: int = 1000):
    """Cascade box predict + stage-averaged info-flow masks (reference
    ``htc_roi_head.py simple_test`` :430-530). Returns the
    ``mask_rcnn_predict`` contract."""
    dets, labels, valid = cascade_rcnn_predict(
        detector, variables, images, img_shapes=img_shapes,
        scale_factors=None, test_cfg=test_cfg, num_proposals=num_proposals)
    feats = detector.apply(variables, images, training=False)[0]
    if detector.semantic_head is not None:
        _, semantic_feat = detector.apply(variables, feats,
                                          method=detector.semantic_forward)
    else:
        semantic_feat = None
    strides = tuple(detector.rpn_head.strides)[:4]
    mh = detector.mask_heads[0]
    b, n = dets.shape[:2]
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    flat = jnp.concatenate(
        [batch_idx.reshape(-1, 1).astype(jnp.float32),
         dets[..., :4].reshape(-1, 4)], axis=1)
    mfeats = extract_roi_feats(feats, flat, valid.reshape(-1), strides,
                               mh.roi_size)
    mfeats = mfeats + _semantic_roi_feats(
        semantic_feat, flat, valid.reshape(-1), mh.roi_size)
    res_feat = None
    prob_sum = None
    cls = jnp.clip(labels.reshape(-1), 0, mh.num_classes - 1)
    for j in range(len(detector.mask_heads)):
        logits, res_feat = detector.apply(
            variables, mfeats, j, res_feat,
            method=detector.htc_mask_forward)
        p = jax.nn.sigmoid(jnp.take_along_axis(
            logits, cls[:, None, None, None], axis=-1)[..., 0])
        prob_sum = p if prob_sum is None else prob_sum + p
    probs = prob_sum / len(detector.mask_heads)
    if scale_factors is not None:
        dets = jnp.concatenate(
            [dets[..., :4] / scale_factors[:, None, :], dets[..., 4:]],
            axis=-1)
    s = probs.shape[1]
    return dets, labels, valid, probs.reshape(b, n, s, s)


# ---------------------------------------------------------------------------
# SCNet (reference mmdet/models/roi_heads/scnet_roi_head.py:1-589 +
# detectors/scnet.py): cascade with semantic + global-context fusion on the
# roi features, and a single mask head fed the box branch's relayed fc
# features.
# ---------------------------------------------------------------------------


@DETECTORS.register
class SCNet(CascadeRCNN):
    semantic_head: nn.Module = None
    glbctx_head: nn.Module = None
    relay_head: nn.Module = None

    def semantic_forward(self, feats):
        return self.semantic_head(feats)

    def glbctx_forward(self, feats):
        return self.glbctx_head(feats)

    def relay_forward(self, fc_feat):
        return self.relay_head(fc_feat)

    def roi_forward(self, roi_feats, stage: int = 0,
                    return_shared_feat: bool = False):
        return self.bbox_heads[stage](roi_feats,
                                      return_shared_feat=return_shared_feat)


def _scnet_fuse(roi_feats, semantic_feat, glbctx, flat_rois, valid,
                roi_size):
    """semantic roi-align + per-image global context add (reference
    ``_fuse_glbctx`` + ``_bbox_forward``)."""
    fused = roi_feats + _semantic_roi_feats(semantic_feat, flat_rois, valid,
                                            roi_size)
    img_idx = flat_rois[:, 0].astype(jnp.int32)
    return fused + glbctx[img_idx][:, None, None, :]


def scnet_loss(detector, variables, batch, rng_key=None,
               num_proposals: int = 512, num_samples: int = 256):
    from dsl_tpu.models.roi_heads.htc import semantic_seg_loss
    from dsl_tpu.models.roi_heads.mask_head import (
        mask_head_loss, mask_targets_from_crops, select_positive_rois)
    from dsl_tpu.models.roi_heads.scnet import global_context_loss
    from dsl_tpu.models.roi_heads.standard_roi_head import sample_batch_rois
    from dsl_tpu.core import losses as L
    from dsl_tpu.core.boxes import bbox2delta

    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, batch["images"], training=True)
    losses = _cascade_rpn_losses(detector, rpn_scores, rpn_deltas, batch,
                                 rng_key)

    seg_logits, semantic_feat = detector.apply(
        variables, feats, method=detector.semantic_forward)
    seg_t = _htc_semantic_target(detector, batch, seg_logits.shape[1:3])
    losses["loss_semantic_seg"] = semantic_seg_loss(
        seg_logits, seg_t, loss_weight=detector.semantic_head.loss_weight)
    glb_logits, glbctx = detector.apply(variables, feats,
                                        method=detector.glbctx_forward)
    losses["loss_glbctx"] = global_context_loss(
        glb_logits, batch["gt_labels"],
        batch["gt_valid"].astype(jnp.float32),
        detector.glbctx_head.num_classes,
        loss_weight=detector.glbctx_head.loss_weight)

    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas,
        img_shapes=batch.get("img_shapes"), nms_pre=num_proposals,
        num_proposals=num_proposals)
    proposals = jax.lax.stop_gradient(proposals)
    strides = tuple(detector.rpn_head.strides)[:4]

    keys = jax.random.split(rng_key, len(detector.bbox_heads) + 1)
    samples = None
    b = proposals.shape[0]
    for stage, head in enumerate(detector.bbox_heads):
        w = detector.stage_loss_weights[stage]
        samples = sample_batch_rois(
            proposals, prop_valid, batch, keys[stage], head.num_classes,
            **_stage_rcnn_kw(detector, stage, num_samples))
        rois, valid = samples["rois"], samples["valid"]
        batch_idx = jnp.broadcast_to(
            jnp.arange(b)[:, None], (b, num_samples)).reshape(-1, 1)
        flat = jnp.concatenate(
            [batch_idx.astype(jnp.float32), rois.reshape(-1, 4)], axis=1)
        rfeats = extract_roi_feats(feats, flat, valid.reshape(-1), strides,
                                   head.roi_size)
        rfeats = _scnet_fuse(rfeats, semantic_feat, glbctx, flat,
                             valid.reshape(-1), head.roi_size)
        cls_logits, reg = detector.apply(variables, rfeats, stage,
                                         method=detector.roi_forward)
        from dsl_tpu.models.roi_heads.standard_roi_head import rcnn_bbox_loss

        stage_out = rcnn_bbox_loss(head, cls_logits, reg, samples, batch)
        losses[f"s{stage}.loss_cls"] = w * stage_out["loss_cls"]
        losses[f"s{stage}.loss_bbox"] = w * stage_out["loss_bbox"]
        if stage < len(detector.bbox_heads) - 1:
            p = proposals.shape[1]
            pidx = jnp.broadcast_to(
                jnp.arange(b)[:, None], (b, p)).reshape(-1, 1)
            pflat = jnp.concatenate(
                [pidx.astype(jnp.float32), proposals.reshape(-1, 4)], 1)
            pfeats = extract_roi_feats(feats, pflat,
                                       prop_valid.reshape(-1), strides,
                                       head.roi_size)
            pfeats = _scnet_fuse(pfeats, semantic_feat, glbctx, pflat,
                                 prop_valid.reshape(-1), head.roi_size)
            _, reg_all = detector.apply(variables, pfeats, stage,
                                        method=detector.roi_forward)
            proposals = jax.lax.stop_gradient(
                _decode_stage(head, proposals, reg_all))

    # ---- single mask branch on the last stage's positives ----
    if detector.mask_head is not None and "gt_mask_crops" in batch:
        mh = detector.mask_head
        max_pos = max(1, num_samples // 4)
        prois, plabels, passigned, ppos = select_positive_rois(
            samples["rois"], samples["labels"], samples["assigned"],
            samples["is_pos"], max_pos)
        pidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, max_pos))
        pflat = jnp.concatenate(
            [pidx.reshape(-1, 1).astype(jnp.float32),
             prois.reshape(-1, 4)], axis=1)
        pvalid = ppos.reshape(-1)
        mfeats = extract_roi_feats(feats, pflat, pvalid, strides,
                                   mh.roi_size)
        mfeats = _scnet_fuse(mfeats, semantic_feat, glbctx, pflat, pvalid,
                             mh.roi_size)
        # feature relay from the last bbox head's shared fc
        last = len(detector.bbox_heads) - 1
        bh = detector.bbox_heads[last]
        bfeats = extract_roi_feats(feats, pflat, pvalid, strides,
                                   bh.roi_size)
        bfeats = _scnet_fuse(bfeats, semantic_feat, glbctx, pflat, pvalid,
                             bh.roi_size)
        _, _, fc_feat = detector.apply(variables, bfeats, last, True,
                                       method=detector.roi_forward)
        mfeats = mfeats + detector.apply(variables, fc_feat,
                                         method=detector.relay_forward)
        logits = detector.apply(variables, mfeats,
                                method=detector.mask_forward)
        targets = mask_targets_from_crops(
            batch["gt_mask_crops"], batch["gt_bboxes"],
            prois.reshape(-1, 4), pidx.reshape(-1), passigned.reshape(-1),
            mask_size=logits.shape[1])
        losses["loss_mask"] = mask_head_loss(
            logits, targets, plabels.reshape(-1),
            pvalid.astype(jnp.float32), mh.num_classes)
    return _parse_losses(losses)


def scnet_predict(detector, variables, images, img_shapes=None,
                  scale_factors=None, test_cfg=None,
                  num_proposals: int = 1000):
    """Cascade predict with SCNet fusion + relayed-feature mask
    (``mask_rcnn_predict`` contract)."""
    tc = dict(test_cfg or detector.test_cfg or {})
    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, images, training=False)
    _, semantic_feat = detector.apply(variables, feats,
                                      method=detector.semantic_forward)
    _, glbctx = detector.apply(variables, feats,
                               method=detector.glbctx_forward)
    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas, img_shapes=img_shapes,
        nms_pre=num_proposals, num_proposals=num_proposals)
    strides = tuple(detector.rpn_head.strides)[:4]
    b, p = proposals.shape[:2]
    pidx = jnp.broadcast_to(
        jnp.arange(b)[:, None], (b, p)).reshape(-1, 1).astype(jnp.float32)

    def stage_fn(stage, props):
        head = detector.bbox_heads[stage]
        flat = jnp.concatenate([pidx, props.reshape(-1, 4)], 1)
        rfeats = extract_roi_feats(feats, flat, prop_valid.reshape(-1),
                                   strides, head.roi_size)
        rfeats = _scnet_fuse(rfeats, semantic_feat, glbctx, flat,
                             prop_valid.reshape(-1), head.roi_size)
        return detector.apply(variables, rfeats, stage,
                              method=detector.roi_forward)

    dets, labels, valid = cascade_decode_nms(
        detector.bbox_heads, stage_fn, proposals, prop_valid,
        img_shapes=img_shapes, scale_factors=scale_factors, test_cfg=tc)

    mh = detector.mask_head
    n = dets.shape[1]
    boxes_in = dets[..., :4]
    if scale_factors is not None:
        boxes_in = boxes_in * scale_factors[:, None, :]
    midx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    mflat = jnp.concatenate(
        [midx.reshape(-1, 1).astype(jnp.float32),
         boxes_in.reshape(-1, 4)], axis=1)
    mvalid = valid.reshape(-1)
    mfeats = extract_roi_feats(feats, mflat, mvalid, strides, mh.roi_size)
    mfeats = _scnet_fuse(mfeats, semantic_feat, glbctx, mflat, mvalid,
                         mh.roi_size)
    last = len(detector.bbox_heads) - 1
    bh = detector.bbox_heads[last]
    bfeats = extract_roi_feats(feats, mflat, mvalid, strides, bh.roi_size)
    bfeats = _scnet_fuse(bfeats, semantic_feat, glbctx, mflat, mvalid,
                         bh.roi_size)
    _, _, fc_feat = detector.apply(variables, bfeats, last, True,
                                   method=detector.roi_forward)
    mfeats = mfeats + detector.apply(variables, fc_feat,
                                     method=detector.relay_forward)
    logits = detector.apply(variables, mfeats, method=detector.mask_forward)
    cls = jnp.clip(labels.reshape(-1), 0, mh.num_classes - 1)
    probs = jax.nn.sigmoid(jnp.take_along_axis(
        logits, cls[:, None, None, None], axis=-1)[..., 0])
    s = probs.shape[1]
    return dets, labels, valid, probs.reshape(b, n, s, s)
