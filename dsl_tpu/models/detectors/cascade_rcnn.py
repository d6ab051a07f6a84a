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

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images, training: bool = False):
        feats = self.extract_feat(images)
        return feats, self.rpn_head(feats, training=training)

    def roi_forward(self, roi_feats, stage: int = 0):
        return self.bbox_heads[stage](roi_feats)

    def mask_forward(self, roi_feats):
        return self.mask_head(roi_feats)


def build_cascade_rcnn(cfg: dict) -> CascadeRCNN:
    cfg = dict(cfg)
    cfg.pop("type", None)
    backbone = build_from_cfg(cfg.pop("backbone"), MODELS)
    neck = build_from_cfg(cfg.pop("neck"), MODELS)
    rpn = build_from_cfg(cfg.pop("rpn_head"), MODELS)
    head_cfgs = cfg.pop("bbox_heads")
    heads = tuple(build_from_cfg(dict(c), MODELS) for c in head_cfgs)
    mask_cfg = cfg.pop("mask_head", None)
    mask_head = build_from_cfg(mask_cfg, MODELS) if mask_cfg else None
    return CascadeRCNN(backbone=backbone, neck=neck, rpn_head=rpn,
                      bbox_heads=heads, mask_head=mask_head,
                      test_cfg=cfg.pop("test_cfg", None),
                      train_cfg=cfg.pop("train_cfg", None))


def _decode_stage(head, proposals, reg, labels=None):
    """Decode one stage's (class-mean or class-specific) refinement."""
    nc = head.num_classes
    b, p = proposals.shape[:2]
    reg = reg.reshape(b, p, nc, 4)
    if labels is None:
        reg_sel = reg.mean(axis=2)
    else:
        reg_sel = jnp.take_along_axis(
            reg, labels[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    return delta2bbox(proposals, reg_sel, head.target_means,
                      head.target_stds)


def cascade_rcnn_loss(detector, variables, batch, rng_key=None,
                      num_proposals: int = 512, num_samples: int = 256):
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, batch["images"], training=True)
    losses = rpn_loss(detector.rpn_head, rpn_scores, rpn_deltas, batch)

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
            num_samples=num_samples)
        stage_losses = roi_head_loss(
            head, roi_apply, variables, feats, proposals, prop_valid,
            batch, keys[stage], strides=strides, num_samples=num_samples,
            samples=samples)
        if detector.mask_head is not None and "gt_mask_crops" in batch:
            # per-stage mask loss with the shared mask head (Cascade Mask
            # R-CNN; the reference keeps one mask head per stage — shared
            # parameters here, same loss schedule)
            from dsl_tpu.models.detectors.two_stage import _mask_branch_loss

            lm, _ = _mask_branch_loss(detector, variables, feats, samples,
                                      batch, num_samples=num_samples)
            losses[f"s{stage}.loss_mask"] = lm * CASCADE_WEIGHTS[stage]
        w = CASCADE_WEIGHTS[stage]
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


def cascade_rcnn_predict(detector, variables, images, img_shapes=None,
                         scale_factors=None, test_cfg=None,
                         num_proposals: int = 1000):
    tc = dict(test_cfg or detector.test_cfg or {})
    rcnn = dict(tc.get("rcnn", {}) or {})
    nms_cfg = dict(rcnn.get("nms", {}) or {})
    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, images, training=False)
    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas, img_shapes=img_shapes,
        nms_pre=num_proposals, num_proposals=num_proposals)
    strides = tuple(detector.rpn_head.strides)[:4]

    b, p = proposals.shape[:2]
    score_sum = None
    for stage, head in enumerate(detector.bbox_heads):
        batch_idx = jnp.broadcast_to(
            jnp.arange(b)[:, None], (b, p)).reshape(-1, 1)
        flat = jnp.concatenate(
            [batch_idx.astype(jnp.float32), proposals.reshape(-1, 4)], 1)
        rfeats = extract_roi_feats(feats, flat, prop_valid.reshape(-1),
                                   strides, head.roi_size)
        cls_logits, reg = detector.apply(variables, rfeats, stage,
                                         method=detector.roi_forward)
        nc = head.num_classes
        scores = jax.nn.softmax(cls_logits, -1)[:, :nc].reshape(b, p, nc)
        score_sum = scores if score_sum is None else score_sum + scores
        proposals = _decode_stage(head, proposals, reg)
        if img_shapes is not None:
            xlim = img_shapes[:, None, 1:2]
            ylim = img_shapes[:, None, 0:1]
            proposals = jnp.concatenate(
                [jnp.clip(proposals[..., 0:1], 0, xlim),
                 jnp.clip(proposals[..., 1:2], 0, ylim),
                 jnp.clip(proposals[..., 2:3], 0, xlim),
                 jnp.clip(proposals[..., 3:4], 0, ylim)], axis=-1)
    scores = score_sum / len(detector.bbox_heads)
    boxes = proposals
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]

    def _single(bx, sc, vd):
        return multiclass_nms(bx, sc, score_thr=rcnn.get("score_thr", 0.05),
                              iou_threshold=nms_cfg.get("iou_threshold", 0.5),
                              max_per_img=rcnn.get("max_per_img", 100),
                              valid=vd)

    return jax.vmap(_single)(boxes, scores, prop_valid)
