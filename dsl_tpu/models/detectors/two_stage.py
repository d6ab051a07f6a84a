"""Two-stage detector (Faster R-CNN) — RPN + standard RoI head.

Parity with ``/root/reference/mmdet/models/detectors/two_stage.py`` /
``faster_rcnn.py``: backbone → FPN (P2-P6) → RPN proposals → RoIAlign →
Shared2FC bbox head; losses = RPN (BCE+L1) + RoI (CE + class-specific
smooth-L1). All stages fixed-shape (padded proposals + validity masks), so
the whole train step jits like the single-stage path.
"""

from __future__ import annotations

from typing import Any

import jax
import flax.linen as nn

from dsl_tpu.registry import DETECTORS, MODELS, build_from_cfg
from dsl_tpu.models.dense_heads.rpn_head import (
    rpn_loss, rpn_proposals)
from dsl_tpu.models.roi_heads.standard_roi_head import (
    roi_head_loss, roi_head_predict)
from dsl_tpu.models.detectors.single_stage import _parse_losses


@DETECTORS.register
class TwoStageDetector(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module
    bbox_head: nn.Module       # the RoI bbox head
    train_cfg: Any = None
    test_cfg: Any = None

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images, training: bool = False):
        feats = self.extract_feat(images)
        rpn_out = self.rpn_head(feats, training=training)
        return feats, rpn_out

    def roi_forward(self, roi_feats):
        return self.bbox_head(roi_feats)


@DETECTORS.register
class FasterRCNN(TwoStageDetector):
    """Faster R-CNN (``mmdet/models/detectors/faster_rcnn.py``)."""


def build_two_stage_detector(cfg: dict) -> TwoStageDetector:
    cfg = dict(cfg)
    det_type = cfg.pop("type", "FasterRCNN")
    backbone = build_from_cfg(cfg.pop("backbone"), MODELS)
    neck = build_from_cfg(cfg.pop("neck"), MODELS)
    rpn = build_from_cfg(cfg.pop("rpn_head"), MODELS)
    roi = build_from_cfg(cfg.pop("bbox_head"), MODELS)
    det_cls = MODELS.get(det_type)
    return det_cls(backbone=backbone, neck=neck, rpn_head=rpn, bbox_head=roi,
                   train_cfg=cfg.pop("train_cfg", None),
                   test_cfg=cfg.pop("test_cfg", None))


def _strides_from(detector) -> tuple:
    return tuple(detector.rpn_head.strides)[:4]


def two_stage_loss(detector, variables, batch, rng_key=None,
                   num_proposals: int = 512, num_samples: int = 256):
    """Full two-stage training loss (jittable; rng drives roi sampling)."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def fwd(variables, images):
        return detector.apply(variables, images, training=True)

    feats, (rpn_scores, rpn_deltas) = fwd(variables, batch["images"])
    losses = rpn_loss(detector.rpn_head, rpn_scores, rpn_deltas, batch)

    img_shapes = batch.get("img_shapes")
    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas, img_shapes=img_shapes,
        nms_pre=num_proposals, num_proposals=num_proposals)
    proposals = jax.lax.stop_gradient(proposals)

    def roi_apply(v, roi_feats):
        return detector.apply(v, roi_feats, method=detector.roi_forward)

    roi_losses = roi_head_loss(
        detector.bbox_head, roi_apply, variables, feats, proposals,
        prop_valid, batch, rng_key, strides=_strides_from(detector),
        num_samples=num_samples)
    for k, v in roi_losses.items():
        losses[k] = v
    return _parse_losses(losses)


def two_stage_predict(detector, variables, images, img_shapes=None,
                      scale_factors=None, test_cfg: dict | None = None,
                      num_proposals: int = 1000):
    tc = dict(test_cfg or detector.test_cfg or {})
    rcnn = dict(tc.get("rcnn", {}) or {})
    nms_cfg = dict(rcnn.get("nms", {}) or {})
    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, images, training=False)
    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas, img_shapes=img_shapes,
        nms_pre=num_proposals, num_proposals=num_proposals)

    def roi_apply(v, roi_feats):
        return detector.apply(v, roi_feats, method=detector.roi_forward)

    return roi_head_predict(
        detector.bbox_head, roi_apply, variables, feats, proposals,
        prop_valid, img_shapes=img_shapes, scale_factors=scale_factors,
        strides=_strides_from(detector),
        score_thr=rcnn.get("score_thr", 0.05),
        iou_threshold=nms_cfg.get("iou_threshold", 0.5),
        max_per_img=rcnn.get("max_per_img", 100))
