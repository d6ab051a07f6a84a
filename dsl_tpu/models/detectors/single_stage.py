"""Single-stage detector composition + functional train/test entry points.

Parity with ``/root/reference/mmdet/models/detectors/single_stage.py:1-165``
and the ``BaseDetector.train_step`` contract (``base.py:210-260``) — but
instead of a stateful module with ``forward(return_loss=...)``, the detector
is a pure flax module (backbone→neck→head) plus pure functions:

  ``detector_loss(detector, variables, batch, ...) -> (total, log_vars)``
  ``detector_predict(detector, variables, batch, ...) -> (dets, labels, valid)``

``_parse_losses`` reproduces the reference's convention: every ``loss*`` key
is summed into the total, everything is logged.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import DETECTORS, MODELS, build_from_cfg
from dsl_tpu.models.dense_heads.fcos_head import (
    fcos_get_bboxes, fcos_loss)


@DETECTORS.register
class SingleStageDetector(nn.Module):
    backbone: nn.Module
    neck: nn.Module | None
    bbox_head: nn.Module
    train_cfg: Any = None
    test_cfg: Any = None

    def extract_feat(self, images):
        feats = self.backbone(images)
        if self.neck is not None:
            feats = self.neck(feats)
        return feats

    def __call__(self, images, training: bool = False):
        feats = self.extract_feat(images)
        return self.bbox_head(feats, training=training)


@DETECTORS.register
class FCOS(SingleStageDetector):
    """FCOS = SingleStageDetector with an FCOSHead
    (``mmdet/models/detectors/fcos.py``)."""


@DETECTORS.register(name="NASFCOS")
class NASFCOS(FCOS):
    """NAS-FCOS (``mmdet/models/detectors/nasfcos.py``): FCOS with the
    searched NASFCOS_FPN neck / NASFCOSHead — reference configs use
    ``type='NASFCOS'``."""


@DETECTORS.register
class RetinaNet(SingleStageDetector):
    """RetinaNet = SingleStageDetector with a RetinaHead
    (``mmdet/models/detectors/retinanet.py``)."""


@DETECTORS.register
class ATSS(SingleStageDetector):
    """ATSS = SingleStageDetector with an ATSS-assigned anchor head
    (``mmdet/models/detectors/atss.py``)."""


@DETECTORS.register
class GFL(SingleStageDetector):
    """GFL = SingleStageDetector with a GFLHead
    (``mmdet/models/detectors/gfl.py``)."""


@DETECTORS.register
class YOLOV3(SingleStageDetector):
    """YOLOv3 (``mmdet/models/detectors/yolo.py``): Darknet + YOLOV3Neck +
    YOLOV3Head."""


@DETECTORS.register
class SSD(SingleStageDetector):
    """SSD = SingleStageDetector with an SSDHead + hard-negative mining
    (``mmdet/models/detectors/single_stage.py`` + ``ssd_head.py``)."""


@DETECTORS.register
class CenterNet(SingleStageDetector):
    """CenterNet (``mmdet/models/detectors/centernet.py``): backbone +
    CTResNetNeck + CenterNetHead."""


@DETECTORS.register
class VFNet(SingleStageDetector):
    """VarifocalNet (``mmdet/models/detectors/vfnet.py``)."""


@DETECTORS.register
class AutoAssign(SingleStageDetector):
    """AutoAssign (``mmdet/models/detectors/autoassign.py``)."""


@DETECTORS.register
class PAA(SingleStageDetector):
    """PAA (``mmdet/models/detectors/paa.py``)."""


@DETECTORS.register
class RepPointsDetector(SingleStageDetector):
    """RepPoints (``mmdet/models/detectors/reppoints_detector.py``)."""


@DETECTORS.register
class FOVEA(SingleStageDetector):
    """FoveaBox (``mmdet/models/detectors/fovea.py``)."""


@DETECTORS.register
class FSAF(SingleStageDetector):
    """FSAF (``mmdet/models/detectors/fsaf.py``)."""


@DETECTORS.register
class YOLOF(SingleStageDetector):
    """YOLOF (``mmdet/models/detectors/yolof.py``)."""


@DETECTORS.register
class DETR(SingleStageDetector):
    """DETR (``mmdet/models/detectors/detr.py``): backbone + set
    prediction head (no neck)."""


@DETECTORS.register
class KnowledgeDistillationSingleStageDetector(SingleStageDetector):
    """KD one-stage (``mmdet/models/detectors/kd_one_stage.py:11-100``):
    student single-stage detector + frozen teacher whose head outputs are
    the LD soft targets."""

    teacher: nn.Module | None = None

    def teacher_forward(self, images):
        return self.teacher(images, training=False)


@DETECTORS.register
class DeformableDETR(SingleStageDetector):
    """Deformable DETR (``mmdet/models/detectors/deformable_detr.py``):
    ChannelMapper neck + multi-scale deformable-attention head."""


@DETECTORS.register
class YOLACT(SingleStageDetector):
    """YOLACT (``mmdet/models/detectors/yolact.py:9-116``): single-stage
    detector with a protonet (mask_head) and a training-only segm head."""

    segm_head: nn.Module | None = None
    proto_head: nn.Module | None = None

    def __call__(self, images, training: bool = False):
        feats = self.extract_feat(images)
        cls_scores, bbox_preds, coeff_preds = self.bbox_head(
            feats, training=training)
        protos = self.proto_head(feats[0])
        segm = self.segm_head(feats[0])
        return cls_scores, bbox_preds, coeff_preds, protos, segm


@DETECTORS.register
class CornerNet(SingleStageDetector):
    """CornerNet (``mmdet/models/detectors/cornernet.py``): HourglassNet +
    CornerHead, no neck."""


@DETECTORS.register
class CentripetalNet(SingleStageDetector):
    """CentripetalNet — CornerNet with a CentripetalHead
    (``configs/centripetalnet``)."""


def build_detector(cfg: dict, train_cfg=None, test_cfg=None) -> nn.Module:
    """Build a detector module tree from a model config dict.

    Dispatches on the config shape: ``rpn_head`` → two-stage (list of
    ``bbox_heads`` → cascade); ``necks``/``bbox_heads`` without rpn →
    multi-head co-training; otherwise single-stage."""
    cfg = dict(cfg)
    if cfg.get("type") == "SparseRCNN":
        from dsl_tpu.models.roi_heads.sparse_rcnn import build_sparse_rcnn

        return build_sparse_rcnn(cfg)
    if "rpn_head" in cfg:
        if "bbox_heads" in cfg:
            from dsl_tpu.models.detectors.cascade_rcnn import \
                build_cascade_rcnn

            return build_cascade_rcnn(cfg)
        from dsl_tpu.models.detectors.two_stage import \
            build_two_stage_detector

        return build_two_stage_detector(cfg)
    if "bbox_heads" in cfg or "necks" in cfg:
        from dsl_tpu.models.detectors.multi_head import \
            build_multi_head_detector

        return build_multi_head_detector(cfg)
    det_type = cfg.pop("type")
    backbone = build_from_cfg(cfg.pop("backbone"), MODELS)
    neck_cfg = cfg.pop("neck", None)
    if isinstance(neck_cfg, (list, tuple)):   # e.g. [FPN, BFP] (Libra)
        from dsl_tpu.models.necks.channel_mapper import SequentialNeck

        neck = SequentialNeck(necks=tuple(
            build_from_cfg(c, MODELS) for c in neck_cfg))
    else:
        neck = build_from_cfg(neck_cfg, MODELS) if neck_cfg else None
    head = build_from_cfg(_clean_head_cfg(cfg.pop("bbox_head")), MODELS)
    det_cls = MODELS.get(det_type)
    if det_cls is None:
        raise KeyError(f"unknown detector type {det_type}")
    extra = {}
    if det_type == "KnowledgeDistillationSingleStageDetector":
        tc = cfg.pop("teacher_config")
        tc = tc.get("model", tc) if isinstance(tc, dict) else tc
        cfg.pop("teacher_ckpt", None)
        cfg.pop("eval_teacher", None)
        extra["teacher"] = build_detector(dict(tc))
    if det_type == "YOLACT":
        extra["segm_head"] = build_from_cfg(cfg.pop("segm_head"), MODELS)
        # reference calls the protonet "mask_head"
        extra["proto_head"] = build_from_cfg(
            cfg.pop("mask_head", cfg.pop("proto_head", None)), MODELS)
    return det_cls(backbone=backbone, neck=neck, bbox_head=head,
                   train_cfg=train_cfg or cfg.pop("train_cfg", None),
                   test_cfg=test_cfg or cfg.pop("test_cfg", None), **extra)


def init_detector_variables(detector, rng, images):
    """Initialize a detector's full variable tree regardless of family —
    two-stage/cascade detectors carry RoI-side submodules outside
    ``__call__``."""
    import jax

    from dsl_tpu.models.detectors.two_stage import (
        TwoStageDetector, init_two_stage_variables)

    if isinstance(detector, TwoStageDetector):
        return init_two_stage_variables(detector, rng, images)
    if type(detector).__name__ == "SparseRCNN":
        from dsl_tpu.models.roi_heads.sparse_rcnn import (
            init_sparse_rcnn_variables)

        return init_sparse_rcnn_variables(detector, rng, images)
    if type(detector).__name__ == "FastRCNN":
        variables = {k: dict(v)
                     for k, v in detector.init(rng, images).items()}
        bh = detector.bbox_head
        rf = jnp.zeros((1, bh.roi_size, bh.roi_size, bh.in_channels))
        sv = detector.init(jax.random.fold_in(rng, 1), rf,
                           method=detector.roi_forward)
        for col, tree in sv.items():
            variables.setdefault(col, {}).update(tree)
        return variables
    if type(detector).__name__ in ("CascadeRCNN", "HTC",
                                   "HybridTaskCascade", "SCNet"):
        variables = {k: dict(v)
                     for k, v in detector.init(rng, images).items()}
        params = variables["params"]

        def _merge_cols(side_vars):
            for col, tree in side_vars.items():
                if col != "params":
                    variables.setdefault(col, {}).update(tree)
        for stage, bh in enumerate(detector.bbox_heads):
            rf = jnp.zeros((1, bh.roi_size, bh.roi_size, bh.in_channels))
            sv = detector.init(jax.random.fold_in(rng, stage + 1), rf,
                               stage, method=detector.roi_forward)
            params.update(sv["params"])
            _merge_cols(sv)
        mh = getattr(detector, "mask_head", None)
        if mh is not None:
            mf = jnp.zeros((1, mh.roi_size, mh.roi_size, mh.in_channels))
            mv = detector.init(jax.random.fold_in(rng, 99), mf,
                               method=detector.mask_forward)
            params.update(mv["params"])
            _merge_cols(mv)
        if getattr(detector, "semantic_head", None) is not None:
            sizes = [(32 // (2 ** i), 32 // (2 ** i), 3) for i in range(5)]
            fake_feats = [jnp.zeros(
                (1, s[0], s[1], detector.semantic_head.in_channels))
                for s in sizes]
            sv = detector.init(jax.random.fold_in(rng, 98), fake_feats,
                               method=detector.semantic_forward)
            params.update(sv["params"])
            _merge_cols(sv)
        if getattr(detector, "glbctx_head", None) is not None:
            gh_ = detector.glbctx_head
            fake = [jnp.zeros((1, 4, 4, gh_.in_channels))]
            gv = detector.init(jax.random.fold_in(rng, 97), fake,
                               method=detector.glbctx_forward)
            params.update(gv["params"])
            _merge_cols(gv)
        if getattr(detector, "relay_head", None) is not None:
            rh = detector.relay_head
            rv = detector.init(jax.random.fold_in(rng, 96),
                               jnp.zeros((1, rh.in_channels)),
                               method=detector.relay_forward)
            params.update(rv["params"])
            _merge_cols(rv)
        if getattr(detector, "mask_heads", None) is not None:
            for stage, mh in enumerate(detector.mask_heads):
                mf = jnp.zeros((1, mh.roi_size, mh.roi_size, mh.in_channels))
                rf = jnp.zeros((1, mh.roi_size, mh.roi_size,
                                mh.conv_out_channels))
                mv = detector.init(jax.random.fold_in(rng, 90 + stage), mf,
                                   stage, rf if stage > 0 else None,
                                   method=detector.htc_mask_forward)
                params.update(mv["params"])
            _merge_cols(mv)
        return variables
    if getattr(detector, "teacher", None) is not None:
        variables = {k: dict(v) for k, v in detector.init(rng,
                                                          images).items()}
        tv = detector.init(jax.random.fold_in(rng, 7), images,
                           method=detector.teacher_forward)
        for col, tree in tv.items():
            variables.setdefault(col, {}).update(tree)
        return variables
    return detector.init(rng, images)


def _clean_head_cfg(head_cfg: dict) -> dict:
    """The loss sub-configs in mmdet head configs select loss *functions*;
    here the functional loss is fixed (focal/GIoU/BCE per the DSL config), so
    they are accepted and recorded but not instantiated."""
    return dict(head_cfg)


def _parse_losses(losses: dict) -> tuple[jnp.ndarray, dict]:
    """Sum every ``loss``-containing key into the total; return log vars
    (reference ``base.py:175-208``)."""
    total = jnp.asarray(0.0, jnp.float32)
    log_vars = {}
    for k, v in losses.items():
        v = jnp.asarray(v, jnp.float32)
        log_vars[k] = v
        if "loss" in k:
            total = total + v
    log_vars["loss"] = total
    return total, log_vars


def detector_loss(detector, variables, batch, cur_iter=0,
                  axis_name: str | None = None, compute_dtype=None):
    """Training forward + loss, dispatched on the head type.

    ``compute_dtype=jnp.bfloat16`` runs the conv forward in bf16 with f32
    master weights; losses are always f32 (reference ``@force_fp32``)."""
    from dsl_tpu.utils.precision import outputs_to_f32, to_compute

    from dsl_tpu.models.detectors.two_stage import (
        TwoStageDetector, two_stage_loss)

    det_name = type(detector).__name__
    if det_name in ("CascadeRCNN", "HTC", "HybridTaskCascade", "SCNet",
                    "SparseRCNN"):
        import jax

        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 jnp.asarray(cur_iter, jnp.uint32))
        if det_name == "SparseRCNN":
            from dsl_tpu.models.roi_heads.sparse_rcnn import sparse_rcnn_loss

            return sparse_rcnn_loss(detector, variables, batch, rng_key=rng)
        from dsl_tpu.models.detectors.cascade_rcnn import (
            cascade_rcnn_loss, htc_loss, scnet_loss)

        fn = {"CascadeRCNN": cascade_rcnn_loss, "HTC": htc_loss,
              "HybridTaskCascade": htc_loss, "SCNet": scnet_loss}[det_name]
        return fn(detector, variables, batch, rng_key=rng)

    if isinstance(detector, TwoStageDetector):
        import jax

        # roi sampling rng is deterministic per step (cur_iter may be traced)
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 jnp.asarray(cur_iter, jnp.uint32))
        if det_name == "TridentFasterRCNN":
            from dsl_tpu.models.detectors.two_stage import trident_loss

            return trident_loss(detector, variables, batch, rng_key=rng)
        return two_stage_loss(detector, variables, batch, rng_key=rng)

    fwd_vars, images = to_compute(variables, batch["images"], compute_dtype)
    outputs = detector.apply(fwd_vars, images, training=True)
    outputs = outputs_to_f32(outputs)
    head = detector.bbox_head
    if type(head).__name__ in ("RetinaHead", "RetinaSepBNHead"):
        from dsl_tpu.models.dense_heads.retina_head import retina_loss

        cls_scores, bbox_preds = outputs
        losses = retina_loss(head, cls_scores, bbox_preds, batch,
                             axis_name=axis_name)
    elif type(head).__name__ == "PISARetinaHead":
        from dsl_tpu.models.dense_heads.pisa_heads import pisa_retina_loss

        cls_scores, bbox_preds = outputs
        losses = pisa_retina_loss(head, cls_scores, bbox_preds, batch,
                                  axis_name=axis_name)
    elif type(head).__name__ == "PISASSDHead":
        from dsl_tpu.models.dense_heads.pisa_heads import pisa_ssd_loss

        cls_scores, bbox_preds = outputs
        losses = pisa_ssd_loss(head, cls_scores, bbox_preds, batch,
                               axis_name=axis_name)
    elif type(head).__name__ == "ATSSHead":
        from dsl_tpu.models.dense_heads.atss_head import atss_loss

        cls_scores, bbox_preds, centernesses = outputs
        losses = atss_loss(head, cls_scores, bbox_preds, centernesses,
                           batch, axis_name=axis_name)
    elif type(head).__name__ == "GFLHead":
        from dsl_tpu.models.dense_heads.gfl_head import gfl_loss

        cls_scores, bbox_dists = outputs
        losses = gfl_loss(head, cls_scores, bbox_dists, batch,
                          axis_name=axis_name)
    elif type(head).__name__ == "LDHead":
        from dsl_tpu.models.dense_heads.ld_head import ld_loss

        t_out = outputs_to_f32(detector.apply(
            fwd_vars, images, method=detector.teacher_forward))
        cls_scores, bbox_dists = outputs
        losses = ld_loss(head, cls_scores, bbox_dists, t_out[1], batch,
                         axis_name=axis_name)
    elif type(head).__name__ == "SSDHead":
        from dsl_tpu.models.dense_heads.ssd_head import ssd_loss

        cls_scores, bbox_preds = outputs
        losses = ssd_loss(head, cls_scores, bbox_preds, batch,
                          axis_name=axis_name)
    elif type(head).__name__ == "YOLOV3Head":
        from dsl_tpu.models.dense_heads.yolo_head import yolo_loss

        losses = yolo_loss(head, outputs, batch, axis_name=axis_name)
    elif type(head).__name__ == "CenterNetHead":
        from dsl_tpu.models.dense_heads.centernet_head import centernet_loss

        losses = centernet_loss(head, outputs, batch, axis_name=axis_name)
    elif type(head).__name__ == "AutoAssignHead":
        from dsl_tpu.models.dense_heads.autoassign_head import autoassign_loss

        losses = autoassign_loss(head, outputs, batch, axis_name=axis_name)
    elif type(head).__name__ == "VFNetHead":
        from dsl_tpu.models.dense_heads.vfnet_head import vfnet_loss

        cls_scores, bbox_preds, bbox_refines = outputs
        losses = vfnet_loss(head, cls_scores, bbox_preds, bbox_refines,
                            batch, axis_name=axis_name)
    elif type(head).__name__ == "PAAHead":
        from dsl_tpu.models.dense_heads.paa_head import paa_loss

        cls_scores, bbox_preds, iou_preds = outputs
        losses = paa_loss(head, cls_scores, bbox_preds, iou_preds, batch,
                          axis_name=axis_name)
    elif type(head).__name__ == "RepPointsHead":
        from dsl_tpu.models.dense_heads.reppoints_head import reppoints_loss

        losses = reppoints_loss(head, outputs, batch, axis_name=axis_name)
    elif type(head).__name__ == "DETRHead":
        from dsl_tpu.models.dense_heads.detr_head import detr_loss

        losses = detr_loss(head, outputs, batch, axis_name=axis_name)
    elif type(head).__name__ == "FoveaHead":
        from dsl_tpu.models.dense_heads.fovea_head import fovea_loss

        cls_scores, bbox_preds = outputs
        losses = fovea_loss(head, cls_scores, bbox_preds, batch,
                            axis_name=axis_name)
    elif type(head).__name__ == "FSAFHead":
        from dsl_tpu.models.dense_heads.fsaf_head import fsaf_loss

        cls_scores, bbox_preds = outputs
        losses = fsaf_loss(head, cls_scores, bbox_preds, batch,
                           axis_name=axis_name)
    elif type(head).__name__ == "FreeAnchorRetinaHead":
        from dsl_tpu.models.dense_heads.free_anchor_head import \
            free_anchor_loss

        cls_scores, bbox_preds = outputs
        losses = free_anchor_loss(head, cls_scores, bbox_preds, batch,
                                  axis_name=axis_name)
    elif type(head).__name__ == "DeformableDETRHead":
        from dsl_tpu.models.dense_heads.deformable_detr_head import \
            deformable_detr_loss

        losses = deformable_detr_loss(head, outputs, batch,
                                      axis_name=axis_name)
    elif type(head).__name__ == "GARetinaHead":
        from dsl_tpu.models.dense_heads.ga_retina_head import ga_retina_loss

        losses = ga_retina_loss(head, outputs, batch, axis_name=axis_name)
    elif type(head).__name__ == "SABLRetinaHead":
        from dsl_tpu.models.dense_heads.sabl_retina_head import sabl_loss

        cls_scores, bucket_cls, bucket_reg = outputs
        losses = sabl_loss(head, cls_scores, bucket_cls, bucket_reg, batch,
                           axis_name=axis_name)
    elif type(head).__name__ == "YOLACTHead":
        from dsl_tpu.models.dense_heads.yolact_head import yolact_loss

        losses = yolact_loss(
            head, outputs, batch, axis_name=axis_name,
            mask_weight=float(getattr(detector.proto_head,
                                      "loss_mask_weight", 6.125)))
    elif type(head).__name__ == "CornerHead":
        from dsl_tpu.models.dense_heads.corner_head import corner_loss

        losses = corner_loss(head, outputs, batch, axis_name=axis_name)
    elif type(head).__name__ == "CentripetalHead":
        from dsl_tpu.models.dense_heads.corner_head import centripetal_loss

        losses = centripetal_loss(head, outputs, batch, axis_name=axis_name)
    elif type(head).__name__ == "YOLOFHead":
        from dsl_tpu.models.dense_heads.yolof_head import yolof_loss

        cls_scores, bbox_preds = outputs
        losses = yolof_loss(head, cls_scores, bbox_preds, batch,
                            axis_name=axis_name)
    else:
        cls_scores, bbox_preds, centernesses = outputs
        losses = fcos_loss(head, cls_scores, bbox_preds, centernesses,
                           batch, cur_iter=cur_iter, axis_name=axis_name)
    return _parse_losses(losses)


def detector_predict(detector, variables, images, img_shapes=None,
                     scale_factors=None, test_cfg: dict | None = None,
                     compute_dtype=None):
    """Inference forward + decode + NMS (``simple_test`` path, §3.4)."""
    from dsl_tpu.utils.precision import outputs_to_f32, to_compute

    from dsl_tpu.models.detectors.two_stage import (
        TwoStageDetector, two_stage_predict)

    det_name = type(detector).__name__
    if det_name in ("CascadeRCNN", "HTC", "HybridTaskCascade", "SCNet",
                    "SparseRCNN"):
        if det_name == "SparseRCNN":
            from dsl_tpu.models.roi_heads.sparse_rcnn import (
                sparse_rcnn_predict)

            return sparse_rcnn_predict(detector, variables, images,
                                       img_shapes=img_shapes,
                                       scale_factors=scale_factors,
                                       test_cfg=test_cfg)
        from dsl_tpu.models.detectors.cascade_rcnn import (
            cascade_rcnn_predict, htc_predict, scnet_predict)

        fn = {"CascadeRCNN": cascade_rcnn_predict, "HTC": htc_predict,
              "HybridTaskCascade": htc_predict,
              "SCNet": scnet_predict}[det_name]
        return fn(detector, variables, images, img_shapes=img_shapes,
                  scale_factors=scale_factors, test_cfg=test_cfg)

    if isinstance(detector, TwoStageDetector):
        if type(detector).__name__ == "GridRCNN":
            from dsl_tpu.models.detectors.two_stage import grid_rcnn_predict

            return grid_rcnn_predict(detector, variables, images,
                                     img_shapes=img_shapes,
                                     scale_factors=scale_factors,
                                     test_cfg=test_cfg)
        return two_stage_predict(detector, variables, images,
                                 img_shapes=img_shapes,
                                 scale_factors=scale_factors,
                                 test_cfg=test_cfg)

    tc = dict(test_cfg or detector.test_cfg or {})
    nms_cfg = dict(tc.get("nms", {}) or {})
    fwd_vars, images = to_compute(variables, images, compute_dtype)
    outputs = detector.apply(fwd_vars, images, training=False)
    outputs = outputs_to_f32(outputs)
    head = detector.bbox_head
    common = dict(img_shapes=img_shapes, scale_factors=scale_factors,
                  nms_pre=tc.get("nms_pre", 1000),
                  score_thr=tc.get("score_thr", 0.05),
                  iou_threshold=nms_cfg.get("iou_threshold", 0.6),
                  max_per_img=tc.get("max_per_img", 100))
    if type(head).__name__ in ("RetinaHead", "FreeAnchorRetinaHead",
                               "PISARetinaHead", "RetinaSepBNHead"):
        from dsl_tpu.models.dense_heads.retina_head import retina_get_bboxes

        cls_scores, bbox_preds = outputs
        return retina_get_bboxes(head, cls_scores, bbox_preds, **common)
    if type(head).__name__ == "ATSSHead":
        from dsl_tpu.models.dense_heads.atss_head import atss_get_bboxes

        cls_scores, bbox_preds, centernesses = outputs
        return atss_get_bboxes(head, cls_scores, bbox_preds, centernesses,
                               **common)
    if type(head).__name__ in ("GFLHead", "LDHead"):
        from dsl_tpu.models.dense_heads.gfl_head import gfl_get_bboxes

        cls_scores, bbox_dists = outputs
        return gfl_get_bboxes(head, cls_scores, bbox_dists, **common)
    if type(head).__name__ in ("SSDHead", "PISASSDHead"):
        from dsl_tpu.models.dense_heads.ssd_head import ssd_get_bboxes

        cls_scores, bbox_preds = outputs
        return ssd_get_bboxes(head, cls_scores, bbox_preds, **common)
    if type(head).__name__ == "YOLOV3Head":
        from dsl_tpu.models.dense_heads.yolo_head import yolo_get_bboxes

        common.pop("nms_pre")
        return yolo_get_bboxes(head, outputs, nms_pre=tc.get("nms_pre", 1000),
                               conf_thr=tc.get("conf_thr", 0.005), **common)
    if type(head).__name__ == "CenterNetHead":
        from dsl_tpu.models.dense_heads.centernet_head import \
            centernet_get_bboxes

        common.pop("nms_pre")
        return centernet_get_bboxes(head, outputs, **common)
    if type(head).__name__ == "AutoAssignHead":
        from dsl_tpu.models.dense_heads.autoassign_head import \
            autoassign_get_bboxes

        return autoassign_get_bboxes(head, outputs, **common)
    if type(head).__name__ == "VFNetHead":
        from dsl_tpu.models.dense_heads.vfnet_head import vfnet_get_bboxes

        cls_scores, bbox_preds, bbox_refines = outputs
        return vfnet_get_bboxes(head, cls_scores, bbox_preds, bbox_refines,
                                **common)
    if type(head).__name__ == "PAAHead":
        from dsl_tpu.models.dense_heads.paa_head import paa_get_bboxes

        cls_scores, bbox_preds, iou_preds = outputs
        return paa_get_bboxes(head, cls_scores, bbox_preds, iou_preds,
                              **common)
    if type(head).__name__ == "RepPointsHead":
        from dsl_tpu.models.dense_heads.reppoints_head import \
            reppoints_get_bboxes

        return reppoints_get_bboxes(head, outputs, **common)
    if type(head).__name__ == "DETRHead":
        from dsl_tpu.models.dense_heads.detr_head import detr_get_bboxes

        common.pop("nms_pre", None)
        common.pop("iou_threshold", None)
        # the reference DETR keeps ALL top max_per_img queries (no score
        # threshold in its test_cfg) — don't impose the generic 0.05
        common["score_thr"] = tc.get("score_thr", 0.0)
        return detr_get_bboxes(head, outputs, **common)
    if type(head).__name__ == "FoveaHead":
        from dsl_tpu.models.dense_heads.fovea_head import fovea_get_bboxes

        cls_scores, bbox_preds = outputs
        return fovea_get_bboxes(head, cls_scores, bbox_preds, **common)
    if type(head).__name__ == "FSAFHead":
        from dsl_tpu.models.dense_heads.fsaf_head import fsaf_get_bboxes

        cls_scores, bbox_preds = outputs
        return fsaf_get_bboxes(head, cls_scores, bbox_preds, **common)
    if type(head).__name__ == "DeformableDETRHead":
        from dsl_tpu.models.dense_heads.deformable_detr_head import \
            deformable_detr_get_bboxes

        common.pop("nms_pre", None)
        common.pop("iou_threshold", None)
        common.pop("img_shapes", None)
        return deformable_detr_get_bboxes(
            head, outputs, img_shapes=img_shapes, **common)
    if type(head).__name__ == "GARetinaHead":
        from dsl_tpu.models.dense_heads.ga_retina_head import \
            ga_retina_get_bboxes

        return ga_retina_get_bboxes(head, outputs, **common)
    if type(head).__name__ == "SABLRetinaHead":
        from dsl_tpu.models.dense_heads.sabl_retina_head import \
            sabl_get_bboxes

        cls_scores, bucket_cls, bucket_reg = outputs
        return sabl_get_bboxes(head, cls_scores, bucket_cls, bucket_reg,
                               **common)
    if type(head).__name__ == "YOLACTHead":
        from dsl_tpu.models.dense_heads.yolact_head import yolact_predict

        dets, labels, valid, _ = yolact_predict(
            head, outputs, img_hw=images.shape[1:3], **common)
        return dets, labels, valid
    if type(head).__name__ in ("CornerHead", "CentripetalHead"):
        from dsl_tpu.models.dense_heads.corner_head import corner_get_bboxes

        return corner_get_bboxes(
            head, outputs, img_shapes=img_shapes,
            scale_factors=scale_factors, score_thr=common["score_thr"],
            iou_threshold=common["iou_threshold"],
            max_per_img=common["max_per_img"],
            corner_topk=tc.get("corner_topk", 100),
            local_maximum_kernel=tc.get("local_maximum_kernel", 3),
            distance_threshold=tc.get("distance_threshold", 0.5))
    if type(head).__name__ == "YOLOFHead":
        from dsl_tpu.models.dense_heads.yolof_head import yolof_get_bboxes

        cls_scores, bbox_preds = outputs
        return yolof_get_bboxes(head, cls_scores, bbox_preds, **common)
    cls_scores, bbox_preds, centernesses = outputs
    return fcos_get_bboxes(head, cls_scores, bbox_preds, centernesses,
                           **common)
