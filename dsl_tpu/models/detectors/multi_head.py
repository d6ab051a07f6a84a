"""Co-training multi-head detector (DSL's SingleStageMultiHeadDetector).

Parity with ``/root/reference/mmdet/models/detectors/single_stage_multi_head.py:12-219``
and ``fcos_multihead.py:5-20``: one backbone feeding N (neck, bbox_head)
pairs; training sums all heads' losses (``forward_train`` :71-118); testing
decodes every head and merges the detections with class-aware NMS capped at
100 (``simple_test`` :120-161). Registered but unused by the shipped semi
config — same status as the reference.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import DETECTORS, MODELS, build_from_cfg
from dsl_tpu.core.nms import batched_nms
from dsl_tpu.models.dense_heads.fcos_head import (
    fcos_get_bboxes, fcos_loss)
from dsl_tpu.models.detectors.single_stage import _parse_losses


@DETECTORS.register
class SingleStageMultiHeadDetector(nn.Module):
    backbone: nn.Module
    necks: Sequence[nn.Module]
    bbox_heads: Sequence[nn.Module]
    train_cfg: Any = None
    test_cfg: Any = None

    def __call__(self, images, training: bool = False):
        feats = self.backbone(images)
        outs = []
        for neck, head in zip(self.necks, self.bbox_heads):
            outs.append(head(neck(feats), training=training))
        return tuple(outs)

    @property
    def num_heads(self) -> int:
        return len(self.bbox_heads)


@DETECTORS.register
class FCOSMultiHead(SingleStageMultiHeadDetector):
    """FCOS co-training variant (``fcos_multihead.py``)."""


def build_multi_head_detector(cfg: dict) -> SingleStageMultiHeadDetector:
    cfg = dict(cfg)
    det_type = cfg.pop("type", "FCOSMultiHead")
    backbone = build_from_cfg(cfg.pop("backbone"), MODELS)
    neck_cfgs = cfg.pop("necks", None) or [cfg.pop("neck")]
    head_cfgs = cfg.pop("bbox_heads", None) or [cfg.pop("bbox_head")]
    necks = tuple(build_from_cfg(dict(c), MODELS) for c in neck_cfgs)
    heads = tuple(build_from_cfg(dict(c), MODELS) for c in head_cfgs)
    det_cls = MODELS.get(det_type)
    return det_cls(backbone=backbone, necks=necks, bbox_heads=heads,
                   test_cfg=cfg.pop("test_cfg", None),
                   train_cfg=cfg.pop("train_cfg", None))


def multi_head_loss(detector, variables, batch, cur_iter=0):
    """Sum of per-head FCOS losses, keys suffixed per head (reference sums
    the same-named keys; suffixing keeps them all visible in logs)."""
    outs = detector.apply(variables, batch["images"], training=True)
    losses = {}
    for hi, (cls_scores, bbox_preds, cents) in enumerate(outs):
        head_losses = fcos_loss(detector.bbox_heads[hi], cls_scores,
                                bbox_preds, cents, batch, cur_iter=cur_iter)
        for k, v in head_losses.items():
            losses[f"{k}_h{hi}" if hi else k] = v
    return _parse_losses(losses)


def multi_head_predict(detector, variables, images, img_shapes=None,
                       scale_factors=None, test_cfg: dict | None = None,
                       max_per_img: int = 100):
    """Decode every head, concat, merge by class-aware NMS (cap 100)."""
    tc = dict(test_cfg or detector.test_cfg or {})
    nms_cfg = dict(tc.get("nms", {}) or {})
    max_per_img = tc.get("max_per_img", max_per_img)
    outs = detector.apply(variables, images, training=False)
    all_dets, all_labels, all_valid = [], [], []
    for hi, (cls_scores, bbox_preds, cents) in enumerate(outs):
        dets, labels, valid = fcos_get_bboxes(
            detector.bbox_heads[hi], cls_scores, bbox_preds, cents,
            img_shapes=img_shapes, scale_factors=scale_factors,
            nms_pre=tc.get("nms_pre", 1000),
            score_thr=tc.get("score_thr", 0.05),
            iou_threshold=nms_cfg.get("iou_threshold", 0.6),
            max_per_img=max_per_img)
        all_dets.append(dets)
        all_labels.append(labels)
        all_valid.append(valid)
    dets = jnp.concatenate(all_dets, axis=1)       # (B, H*K, 5)
    labels = jnp.concatenate(all_labels, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    def _merge(d, l, v):
        out_dets, _, out_valid, out_labels = batched_nms(
            d[:, :4], jnp.where(v, d[:, 4], -1e30), l,
            iou_threshold=nms_cfg.get("iou_threshold", 0.6),
            max_out=max_per_img, valid=v)
        return out_dets, out_labels, out_valid

    return jax.vmap(_merge)(dets, labels, valid)
