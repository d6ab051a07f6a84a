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
import jax.numpy as jnp
import flax.linen as nn

from dsl_tpu.registry import DETECTORS, MODELS, build_from_cfg
from dsl_tpu.models.dense_heads.rpn_head import (
    rpn_loss, rpn_loss_any, rpn_proposals, rpn_proposals_any)
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
    roi_pool_pack: nn.Module = None   # DeformRoIPoolPack (dcn dpool/mdpool)

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images, training: bool = False):
        feats = self.extract_feat(images)
        rpn_out = self.rpn_head(feats, training=training)
        return feats, rpn_out

    def roi_forward(self, roi_feats):
        return self.bbox_head(roi_feats)

    def pack_forward(self, roi_feats):
        return self.roi_pool_pack(roi_feats)


@DETECTORS.register
class FasterRCNN(TwoStageDetector):
    """Faster R-CNN (``mmdet/models/detectors/faster_rcnn.py``)."""


@DETECTORS.register
class MaskRCNN(TwoStageDetector):
    """Mask R-CNN (``mmdet/models/detectors/mask_rcnn.py:1-24``): Faster
    R-CNN + FCN mask head on the RoI features."""

    mask_head: nn.Module = None

    def mask_forward(self, roi_feats):
        return self.mask_head(roi_feats)


@DETECTORS.register
class FasterRCNNC4(TwoStageDetector):
    """Faster R-CNN C4 (reference configs ``faster_rcnn_r50_caffe_c4`` +
    ``shared_heads/res_layer.py``): single C4 feature level (stride 16),
    14x14 RoIAlign, res5 shared head per roi, avg-pool bbox head. The
    ``neck`` is an identity/ChannelMapper-style passthrough."""

    shared_head: nn.Module = None

    def roi_forward(self, roi_feats):
        return self.bbox_head(self.shared_head(roi_feats))


@DETECTORS.register
class MaskRCNNC4(FasterRCNNC4):
    """Mask R-CNN C4 (reference ``configs/_base_/models/mask_rcnn_r50_caffe_c4.py``):
    the mask head consumes the res5 shared-head features of positive RoIs."""

    mask_head: nn.Module = None

    def mask_forward(self, roi_feats):
        return self.mask_head(self.shared_head(roi_feats))


@DETECTORS.register
class DynamicRCNN(TwoStageDetector):
    """Dynamic R-CNN (``mmdet/models/roi_heads/dynamic_roi_head.py``):
    Faster R-CNN whose assignment IoU threshold and smooth-L1 beta follow
    the training statistics. The live values arrive as traced scalars in
    ``batch['dyn_iou_thr']`` / ``batch['dyn_beta']``; the step logs
    ``dynamic_iou``/``dynamic_beta`` for the host-side
    :class:`~dsl_tpu.models.roi_heads.dynamic_pisa.DynamicRCNNSchedule`."""


@DETECTORS.register
class PISAFasterRCNN(TwoStageDetector):
    """Faster R-CNN + PISA RoI head (``pisa_roi_head.py``): ISR-P positive
    cls reweighting and CARL regression coupling."""


@DETECTORS.register
class PISAMaskRCNN(MaskRCNN):
    """Mask R-CNN + PISA RoI head (``configs/pisa/pisa_mask_rcnn*``): PISA
    bbox losses + the stock mask branch."""


@DETECTORS.register
class DetectoRS(TwoStageDetector):
    """DetectoRS (``configs/detectors``): DetectoRSResNet (SAC) backbone +
    RFP neck; the neck reruns its own copy of the backbone recursively, so
    it needs the input image."""

    def extract_feat(self, images):
        feats = self.backbone(images)
        return self.neck((images,) + tuple(feats))


@DETECTORS.register
class DoubleHeadRCNN(TwoStageDetector):
    """Double-Head R-CNN (``mmdet/models/roi_heads/double_roi_head.py``):
    fc branch classifies, conv branch regresses on 1.3x-scaled roi
    features."""

    def roi_forward(self, cls_feats, reg_feats):
        return self.bbox_head(cls_feats, reg_feats)


@DETECTORS.register
class PointRend(MaskRCNN):
    """PointRend (``mmdet/models/detectors/point_rend.py`` +
    ``point_rend_roi_head.py``): Mask R-CNN whose mask head is a coarse
    grid refined by an uncertainty-driven point head."""

    point_head: nn.Module = None

    def point_forward(self, fine_feats, coarse_feats):
        return self.point_head(fine_feats, coarse_feats)


@DETECTORS.register
class GridRCNN(TwoStageDetector):
    """Grid R-CNN (``mmdet/models/detectors/grid_rcnn.py`` +
    ``grid_roi_head.py``): cls-only bbox head; localization comes from the
    grid-point head."""

    grid_head: nn.Module = None

    def grid_forward(self, roi_feats):
        return self.grid_head(roi_feats)


@DETECTORS.register
class MaskScoringRCNN(MaskRCNN):
    """Mask Scoring R-CNN (``mmdet/models/detectors/mask_scoring_rcnn.py``):
    Mask R-CNN + a MaskIoU head whose prediction rescales mask scores."""

    mask_iou_head: nn.Module = None

    def mask_iou_forward(self, mask_feats, mask_pred):
        return self.mask_iou_head(mask_feats, mask_pred)


def build_two_stage_detector(cfg: dict) -> TwoStageDetector:
    cfg = dict(cfg)
    det_type = cfg.pop("type", "FasterRCNN")
    backbone = build_from_cfg(cfg.pop("backbone"), MODELS)
    neck_cfg = cfg.pop("neck")
    if isinstance(neck_cfg, (list, tuple)):   # e.g. [FPN, BFP] (Libra)
        from dsl_tpu.models.necks.channel_mapper import SequentialNeck

        neck = SequentialNeck(necks=tuple(
            build_from_cfg(c, MODELS) for c in neck_cfg))
    else:
        neck = build_from_cfg(neck_cfg, MODELS)
    rpn_cfg = cfg.pop("rpn_head", None)
    roi_cfg = cfg.pop("bbox_head", None)
    if det_type == "RPN":             # proposals-only detector
        return RPN(backbone=backbone, neck=neck,
                   rpn_head=build_from_cfg(rpn_cfg, MODELS),
                   train_cfg=cfg.pop("train_cfg", None),
                   test_cfg=cfg.pop("test_cfg", None))
    if det_type == "FastRCNN":        # roi-head-only detector
        return FastRCNN(backbone=backbone, neck=neck,
                        bbox_head=build_from_cfg(roi_cfg, MODELS),
                        train_cfg=cfg.pop("train_cfg", None),
                        test_cfg=cfg.pop("test_cfg", None))
    rpn = build_from_cfg(rpn_cfg, MODELS)
    roi = build_from_cfg(roi_cfg, MODELS)
    det_cls = MODELS.get(det_type)
    kwargs = {}
    mask_cfg = cfg.pop("mask_head", None)
    if mask_cfg is not None:
        kwargs["mask_head"] = build_from_cfg(mask_cfg, MODELS)
    miou_cfg = cfg.pop("mask_iou_head", None)
    if miou_cfg is not None:
        kwargs["mask_iou_head"] = build_from_cfg(miou_cfg, MODELS)
    grid_cfg = cfg.pop("grid_head", None)
    if grid_cfg is not None:
        kwargs["grid_head"] = build_from_cfg(grid_cfg, MODELS)
    point_cfg = cfg.pop("point_head", None)
    if point_cfg is not None:
        kwargs["point_head"] = build_from_cfg(point_cfg, MODELS)
    shared_cfg = cfg.pop("shared_head", None)
    if shared_cfg is not None:
        kwargs["shared_head"] = build_from_cfg(shared_cfg, MODELS)
    pack_cfg = cfg.pop("roi_pool_pack", None)
    if pack_cfg is not None:
        kwargs["roi_pool_pack"] = build_from_cfg(pack_cfg, MODELS)
    return det_cls(backbone=backbone, neck=neck, rpn_head=rpn, bbox_head=roi,
                   train_cfg=cfg.pop("train_cfg", None),
                   test_cfg=cfg.pop("test_cfg", None), **kwargs)


def _strides_from(detector) -> tuple:
    return tuple(detector.rpn_head.strides)[:4]


def _pack_ctx(detector, variables):
    """(pack_apply, variables, pack_module) for deformable RoI pooling, or
    None when the detector has no ``roi_pool_pack``."""
    pk = getattr(detector, "roi_pool_pack", None)
    if pk is None:
        return None
    pack_apply = lambda v, rf: detector.apply(  # noqa: E731
        v, rf, method=detector.pack_forward)
    return (pack_apply, variables, pk)


def init_two_stage_variables(detector, rng, images):
    """Initialize ALL parameter subtrees (backbone/neck/rpn + roi bbox head +
    mask head when present) — flax ``init`` only traces ``__call__``, so the
    RoI-side submodules need their own init passes merged in."""
    import jax.numpy as jnp

    variables = detector.init(rng, images)
    variables = {k: dict(v) for k, v in variables.items()}
    params = variables["params"]

    def merge(side_vars):
        for col, tree in side_vars.items():
            variables.setdefault(col, {}).update(tree)

    bh = detector.bbox_head
    c = bh.in_channels
    if getattr(bh, "roi_extractor", "single") == "concat":
        c *= 4                           # generic concat: all 4 levels
    roi_feats = jnp.zeros((1, bh.roi_size, bh.roi_size, c))
    roi_args = (roi_feats, roi_feats) \
        if getattr(bh, "reg_roi_scale_factor", None) is not None \
        else (roi_feats,)
    roi_vars = detector.init(jax.random.fold_in(rng, 1), *roi_args,
                             method=detector.roi_forward)
    merge({k: v for k, v in roi_vars.items() if k != "params"})
    params.update(roi_vars["params"])
    pk = getattr(detector, "roi_pool_pack", None)
    if pk is not None:
        pk_feats = jnp.zeros((1, pk.output_size, pk.output_size,
                              pk.output_channels))
        pk_vars = detector.init(jax.random.fold_in(rng, 6), pk_feats,
                                method=detector.pack_forward)
        params.update(pk_vars["params"])
    mh = getattr(detector, "mask_head", None)
    if mh is not None:
        mc = mh.in_channels
        if getattr(detector, "shared_head", None) is not None:
            # MaskRCNNC4-style mask_forward re-enters the shared res5 head,
            # so its input is the C4 roi feature (bh.in_channels), not the
            # post-shared-head channels mh.in_channels describes.
            mc = bh.in_channels
        mask_feats = jnp.zeros((1, mh.roi_size, mh.roi_size, mc))
        mask_vars = detector.init(jax.random.fold_in(rng, 2), mask_feats,
                                  method=detector.mask_forward)
        params.update(mask_vars["params"])
    ph = getattr(detector, "point_head", None)
    if ph is not None:
        pt_vars = detector.init(
            jax.random.fold_in(rng, 5),
            jnp.zeros((1, 4, ph.in_channels)),
            jnp.zeros((1, 4, ph.num_classes)),
            method=detector.point_forward)
        params.update(pt_vars["params"])
    gh = getattr(detector, "grid_head", None)
    if gh is not None:
        grid_feats = jnp.zeros((1, gh.roi_size, gh.roi_size, gh.in_channels))
        grid_vars = detector.init(jax.random.fold_in(rng, 4), grid_feats,
                                  method=detector.grid_forward)
        params.update(grid_vars["params"])
    mih = getattr(detector, "mask_iou_head", None)
    if mih is not None:
        s = mh.roi_size
        miou_vars = detector.init(
            jax.random.fold_in(rng, 3),
            jnp.zeros((1, s, s, mih.in_channels)),
            jnp.zeros((1, 2 * s, 2 * s)),
            method=detector.mask_iou_forward)
        params.update(miou_vars["params"])
    return variables


def parse_rcnn_train_cfg(train_cfg, stage_cfg=None):
    """Flatten a reference-style ``train_cfg.rcnn`` dict (assigner +
    sampler sub-dicts) into the ``sample_batch_rois`` kwargs, with the
    reference defaults (``faster_rcnn_r50_fpn.py:80-94``)."""
    rc = dict(stage_cfg if stage_cfg is not None
              else dict(train_cfg or {}).get("rcnn", {}) or {})
    asn = dict(rc.get("assigner", {}) or {})
    smp = dict(rc.get("sampler", {}) or {})
    return dict(
        num_samples=int(smp.get("num", 512)),
        pos_fraction=float(smp.get("pos_fraction", 0.25)),
        add_gt_as_proposals=bool(smp.get("add_gt_as_proposals", True)),
        pos_iou_thr=float(asn.get("pos_iou_thr", 0.5)),
        neg_iou_thr=float(asn.get("neg_iou_thr", 0.5)),
        min_pos_iou=float(asn.get("min_pos_iou", 0.5)),
        match_low_quality=bool(asn.get("match_low_quality", False)))


def two_stage_loss(detector, variables, batch, rng_key=None,
                   num_proposals: int = 512, num_samples: int | None = None,
                   ohem: bool = False):
    """Full two-stage training loss (jittable; rng drives roi sampling).

    Assignment/sampling knobs come from the detector's ``train_cfg``
    (reference ``train_cfg.rpn``/``train_cfg.rcnn`` schema), defaulting to
    the reference Faster R-CNN values. When the detector has a mask head
    (MaskRCNN) and the batch carries ``gt_mask_crops``, the mask branch
    runs on the positive subset of the SAME sampled rois (reference
    ``standard_roi_head.py:180-266``)."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    tc_all = dict(detector.train_cfg or {})
    rpn_cfg = dict(tc_all.get("rpn", {}) or {})
    rcnn_kw = parse_rcnn_train_cfg(tc_all)
    if num_samples is None:
        num_samples = rcnn_kw["num_samples"]
    else:
        rcnn_kw["num_samples"] = num_samples

    def fwd(variables, images):
        return detector.apply(variables, images, training=True)

    feats, rpn_out = fwd(variables, batch["images"])
    losses = rpn_loss_any(detector.rpn_head, rpn_out, batch,
                          train_cfg=rpn_cfg,
                          rng_key=jax.random.fold_in(rng_key, 97))

    img_shapes = batch.get("img_shapes")
    proposals, _, prop_valid = rpn_proposals_any(
        detector.rpn_head, rpn_out, img_shapes=img_shapes,
        nms_pre=num_proposals, num_proposals=num_proposals)
    proposals = jax.lax.stop_gradient(proposals)

    def roi_apply(v, *roi_feats):
        return detector.apply(v, *roi_feats, method=detector.roi_forward)

    from dsl_tpu.models.roi_heads.standard_roi_head import (
        ohem_hardness, sample_batch_rois)

    if isinstance(detector, DynamicRCNN):
        from dsl_tpu.models.roi_heads.dynamic_pisa import dynamic_roi_loss

        tc = dict(detector.train_cfg or {})
        dyn = dict(tc.get("dynamic_rcnn", {}) or {})
        roi_losses = dynamic_roi_loss(
            detector.bbox_head, roi_apply, variables, feats, proposals,
            prop_valid, batch, rng_key, strides=_strides_from(detector),
            num_samples=num_samples,
            iou_thr=batch.get("dyn_iou_thr", dyn.get("initial_iou", 0.4)),
            beta=batch.get("dyn_beta", dyn.get("initial_beta", 1.0)),
            iou_topk=int(dyn.get("iou_topk", 75)),
            beta_topk=int(dyn.get("beta_topk", 10)))
        losses.update(roi_losses)
        return _parse_losses(losses)

    if isinstance(detector, (PISAFasterRCNN, PISAMaskRCNN)):
        from dsl_tpu.models.roi_heads.dynamic_pisa import pisa_roi_loss

        tc = dict(detector.train_cfg or {})
        isr = dict(tc.get("isr", {}) or {})
        carl = dict(tc.get("carl", {}) or {})
        losses.update(pisa_roi_loss(
            detector.bbox_head, roi_apply, variables, feats, proposals,
            prop_valid, batch, rng_key, strides=_strides_from(detector),
            num_samples=num_samples,
            isr_k=float(isr.get("k", 2.0)),
            isr_bias=float(isr.get("bias", 0.0)),
            carl_k=float(carl.get("k", 1.0)),
            carl_bias=float(carl.get("bias", 0.2)),
            isr_n=tc.get("isr_n")))
        if getattr(detector, "mask_head", None) is not None \
                and "gt_mask_crops" in batch:
            # mask branch on a standard sampled roi set (the PISA roi loss
            # reweights cls/reg only — ``pisa_roi_head.py`` keeps the
            # stock mask head)
            mask_samples = sample_batch_rois(
                proposals, prop_valid, batch, rng_key,
                detector.bbox_head.num_classes, **rcnn_kw)
            loss_mask, loss_miou, loss_point = _mask_branch_loss(
                detector, variables, feats, mask_samples, batch,
                num_samples=num_samples, rng_key=rng_key)
            losses["loss_mask"] = loss_mask
        return _parse_losses(losses)

    smp_type = dict(dict(tc_all.get("rcnn", {}) or {}).get(
        "sampler", {}) or {}).get("type", "")
    neg_hardness = None
    if ohem or smp_type == "OHEMSampler":
        neg_hardness = ohem_hardness(
            detector.bbox_head, roi_apply, variables, feats, proposals,
            prop_valid, batch, strides=_strides_from(detector))
    samples = sample_batch_rois(proposals, prop_valid, batch, rng_key,
                                detector.bbox_head.num_classes,
                                neg_hardness=neg_hardness, **rcnn_kw)
    roi_losses = roi_head_loss(
        detector.bbox_head, roi_apply, variables, feats, proposals,
        prop_valid, batch, rng_key, strides=_strides_from(detector),
        num_samples=num_samples, samples=samples,
        pack=_pack_ctx(detector, variables))
    for k, v in roi_losses.items():
        losses[k] = v

    if getattr(detector, "grid_head", None) is not None:
        losses["loss_grid"] = _grid_branch_loss(
            detector, variables, feats, samples, batch, rng_key,
            num_samples=num_samples)

    if getattr(detector, "mask_head", None) is not None \
            and "gt_mask_crops" in batch:
        loss_mask, loss_miou, loss_point = _mask_branch_loss(
            detector, variables, feats, samples, batch,
            num_samples=num_samples, rng_key=rng_key)
        losses["loss_mask"] = loss_mask
        if loss_miou is not None:
            losses["loss_mask_iou"] = loss_miou
        if loss_point is not None:
            losses["loss_point"] = loss_point
    return _parse_losses(losses)


def _grid_branch_loss(detector, variables, feats, samples, batch, rng_key,
                      num_samples: int):
    """Grid branch on jittered positive rois (reference
    ``grid_roi_head.py:27-115``)."""
    from dsl_tpu.models.roi_heads.grid_head import grid_loss, grid_targets
    from dsl_tpu.models.roi_heads.mask_head import select_positive_rois
    from dsl_tpu.models.roi_heads.standard_roi_head import extract_roi_feats

    gh = detector.grid_head
    b = samples["rois"].shape[0]
    max_pos = max(1, num_samples // 4)
    rois, labels, assigned, is_pos = select_positive_rois(
        samples["rois"], samples["labels"], samples["assigned"],
        samples["is_pos"], max_pos)

    # random jitter (amplitude 0.15, reference ``_random_jitter`` :27-50)
    amp = 0.15
    off = jax.random.uniform(jax.random.fold_in(rng_key, 7),
                             (b, max_pos, 4), minval=-amp, maxval=amp)
    cxcy = (rois[..., 2:4] + rois[..., :2]) / 2
    wh = jnp.abs(rois[..., 2:4] - rois[..., :2])
    new_cxcy = cxcy + wh * off[..., :2]
    new_wh = wh * (1 + off[..., 2:])
    rois = jnp.concatenate([new_cxcy - new_wh / 2, new_cxcy + new_wh / 2],
                           axis=-1)
    if "img_shapes" in batch:
        lim = batch["img_shapes"][:, None, :]           # (B, 1, 2) [h, w]
        rois = jnp.stack([jnp.clip(rois[..., 0], 0, lim[..., 1] - 1),
                          jnp.clip(rois[..., 1], 0, lim[..., 0] - 1),
                          jnp.clip(rois[..., 2], 0, lim[..., 1] - 1),
                          jnp.clip(rois[..., 3], 0, lim[..., 0] - 1)],
                         axis=-1)

    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, max_pos))
    flat_rois = jnp.concatenate(
        [batch_idx.reshape(-1, 1).astype(jnp.float32),
         rois.reshape(-1, 4)], axis=1)
    pos = is_pos.reshape(-1)
    roi_feats = extract_roi_feats(
        feats, flat_rois, pos, _strides_from(detector), gh.roi_size)
    pred = detector.apply(variables, roi_feats, method=detector.grid_forward)
    gt = jnp.take_along_axis(batch["gt_bboxes"],
                             jnp.maximum(assigned, 0)[..., None],
                             axis=1).reshape(-1, 4)
    targets = grid_targets(gh, rois.reshape(-1, 4), gt,
                           pos.astype(jnp.float32))
    return grid_loss(gh, pred, targets, pos.astype(jnp.float32))


def grid_rcnn_predict(detector, variables, images, img_shapes=None,
                      scale_factors=None, test_cfg: dict | None = None,
                      num_proposals: int = 1000):
    """Two-stage predict + grid refinement of the detected boxes
    (reference ``grid_roi_head.py simple_test`` :117-169)."""
    from dsl_tpu.models.roi_heads.grid_head import grid_decode
    from dsl_tpu.models.roi_heads.standard_roi_head import extract_roi_feats

    tc = dict(test_cfg or detector.test_cfg or {})
    rcnn = dict(tc.get("rcnn", {}) or {})
    nms_cfg = dict(rcnn.get("nms", {}) or {})
    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, images, training=False)
    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas, img_shapes=img_shapes,
        nms_pre=num_proposals, num_proposals=num_proposals)

    def roi_apply(v, *roi_feats):
        return detector.apply(v, *roi_feats, method=detector.roi_forward)

    dets, labels, valid = roi_head_predict(
        detector.bbox_head, roi_apply, variables, feats, proposals,
        prop_valid, img_shapes=img_shapes, scale_factors=None,
        strides=_strides_from(detector),
        score_thr=rcnn.get("score_thr", 0.05),
        iou_threshold=nms_cfg.get("iou_threshold", 0.5),
        max_per_img=rcnn.get("max_per_img", 100))
    gh = detector.grid_head
    b, n = dets.shape[:2]
    boxes_in = dets[..., :4]                             # input-frame coords
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    flat_rois = jnp.concatenate(
        [batch_idx.reshape(-1, 1).astype(jnp.float32),
         boxes_in.reshape(-1, 4)], axis=1)
    roi_feats = extract_roi_feats(
        feats, flat_rois, valid.reshape(-1),
        strides=_strides_from(detector), roi_size=gh.roi_size)
    pred = detector.apply(variables, roi_feats, method=detector.grid_forward)

    def per_image(bx, hm, shape):
        return grid_decode(gh, bx, hm, img_shapes=shape)

    hm = pred["fused"].reshape(b, n, *pred["fused"].shape[1:])
    if img_shapes is None:
        refined = jax.vmap(lambda bx, h_: grid_decode(gh, bx, h_))(
            boxes_in, hm)
    else:
        refined = jax.vmap(per_image)(boxes_in, hm, img_shapes)
    if scale_factors is not None:
        refined = refined / scale_factors[:, None, :]
    dets = jnp.concatenate([refined, dets[..., 4:5]], axis=-1)
    return dets, labels, valid


def _mask_branch_loss(detector, variables, feats, samples, batch,
                      num_samples: int, rng_key=None):
    """Mask loss on the positive rois of the shared sampling results;
    returns (loss_mask, loss_mask_iou-or-None, loss_point-or-None)."""
    from dsl_tpu.models.roi_heads.mask_head import (
        mask_head_loss, mask_targets_from_crops, select_positive_rois)
    from dsl_tpu.models.roi_heads.standard_roi_head import extract_roi_feats

    mh = detector.mask_head
    b = samples["rois"].shape[0]
    max_pos = max(1, num_samples // 4)
    rois, labels, assigned, is_pos = select_positive_rois(
        samples["rois"], samples["labels"], samples["assigned"],
        samples["is_pos"], max_pos)                      # (B, P, ...)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, max_pos))
    flat_rois = jnp.concatenate(
        [batch_idx.reshape(-1, 1).astype(jnp.float32),
         rois.reshape(-1, 4)], axis=1)
    pos = is_pos.reshape(-1)
    roi_feats = extract_roi_feats(
        feats, flat_rois, pos, _strides_from(detector), mh.roi_size)
    logits = detector.apply(variables, roi_feats,
                            method=detector.mask_forward)

    targets = mask_targets_from_crops(
        batch["gt_mask_crops"], batch["gt_bboxes"], rois.reshape(-1, 4),
        batch_idx.reshape(-1), assigned.reshape(-1),
        mask_size=logits.shape[1])
    loss_mask = mask_head_loss(logits, targets, labels.reshape(-1),
                               pos.astype(jnp.float32), mh.num_classes)

    loss_point = None
    if getattr(detector, "point_head", None) is not None:
        loss_point = _point_branch_loss(
            detector, variables, feats, logits, rois, labels, assigned,
            is_pos, batch, batch_idx,
            rng_key if rng_key is not None else jax.random.PRNGKey(0))
    if getattr(detector, "mask_iou_head", None) is None:
        return loss_mask, None, loss_point

    from dsl_tpu.models.roi_heads.maskiou_head import (
        mask_iou_loss, mask_iou_target)

    cls = jnp.clip(labels.reshape(-1), 0, mh.num_classes - 1)
    pred_prob = jax.nn.sigmoid(jnp.take_along_axis(
        logits, cls[:, None, None, None], axis=-1)[..., 0])
    posf = pos.astype(jnp.float32)
    k = batch["gt_bboxes"].shape[1]
    gi = jnp.clip(assigned.reshape(-1), 0, k - 1)
    crop_idx = batch_idx.reshape(-1) * k + gi
    iou_t = mask_iou_target(
        pred_prob, targets, posf,
        gt_full_areas=batch["gt_mask_areas"].reshape(-1)[crop_idx],
        crops=batch["gt_mask_crops"].reshape(
            -1, *batch["gt_mask_crops"].shape[2:])[crop_idx],
        gt_boxes=batch["gt_bboxes"].reshape(-1, 4)[crop_idx],
        rois=rois.reshape(-1, 4),
        img_shapes=batch["img_shapes"][batch_idx.reshape(-1)])
    iou_pred = detector.apply(variables, roi_feats, pred_prob,
                              method=detector.mask_iou_forward)
    loss_miou = mask_iou_loss(iou_pred, labels.reshape(-1), iou_t, posf,
                              detector.mask_iou_head.num_classes)
    return loss_mask, loss_miou, loss_point


def _point_branch_loss(detector, variables, feats, coarse_logits, rois,
                       labels, assigned, is_pos, batch, batch_idx, rng_key,
                       num_points: int = 196):
    """PointRend train-time point loss (reference
    ``point_rend_roi_head.py:46-66``): importance-sampled roi points, point
    head on fine P2 features + coarse logits, BCE at the gt class against
    GT occupancy sampled from the mask crops."""
    from dsl_tpu.models.roi_heads.point_rend import (
        fine_grained_point_feats, point_targets_from_crops,
        uncertain_points_train)

    b, p = rois.shape[:2]
    flat_labels = labels.reshape(-1)
    s = coarse_logits.shape[1]
    nc = detector.point_head.num_classes
    coarse = coarse_logits.reshape(b * p, s, s, nc)
    rel = uncertain_points_train(jax.random.fold_in(rng_key, 11), coarse,
                                 flat_labels, num_points)   # (BP, Pt, 2)
    rel_b = rel.reshape(b, p, num_points, 2)
    fine = fine_grained_point_feats(
        feats[0], rois, rel_b, stride=_strides_from(detector)[0])
    from dsl_tpu.models.roi_heads.point_rend import _sample_chw
    coarse_pts = jax.vmap(_sample_chw)(coarse, rel)         # (BP, Pt, C)
    point_logits = detector.apply(
        variables, fine.reshape(b * p, num_points, -1), coarse_pts,
        method=detector.point_forward)                      # (BP, Pt, C)

    gt_boxes = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None],
        axis=1).reshape(-1, 4)
    crops = jnp.take_along_axis(
        batch["gt_mask_crops"],
        jnp.maximum(assigned, 0)[..., None, None].astype(jnp.int32),
        axis=1).reshape(-1, *batch["gt_mask_crops"].shape[2:])
    targets = point_targets_from_crops(crops, gt_boxes, rois.reshape(-1, 4),
                                       rel)                 # (BP, Pt)

    cls = jnp.clip(flat_labels, 0, nc - 1)
    sel = jnp.take_along_axis(point_logits, cls[:, None, None],
                              axis=-1)[..., 0]              # (BP, Pt)
    logp = jax.nn.log_sigmoid(sel)
    logq = jax.nn.log_sigmoid(-sel)
    bce = -targets * logp - (1 - targets) * logq
    posf = is_pos.reshape(-1).astype(jnp.float32)
    return jnp.sum(bce * posf[:, None]) / jnp.maximum(
        posf.sum() * num_points, 1.0)


def two_stage_predict(detector, variables, images, img_shapes=None,
                      scale_factors=None, test_cfg: dict | None = None,
                      num_proposals: int = 1000):
    tc = dict(test_cfg or detector.test_cfg or {})
    rcnn = dict(tc.get("rcnn", {}) or {})
    nms_cfg = dict(rcnn.get("nms", {}) or {})
    feats, rpn_out = detector.apply(
        variables, images, training=False)
    proposals, _, prop_valid = rpn_proposals_any(
        detector.rpn_head, rpn_out, img_shapes=img_shapes,
        nms_pre=num_proposals, num_proposals=num_proposals)

    def roi_apply(v, *roi_feats):
        return detector.apply(v, *roi_feats, method=detector.roi_forward)

    return roi_head_predict(
        detector.bbox_head, roi_apply, variables, feats, proposals,
        prop_valid, img_shapes=img_shapes, scale_factors=scale_factors,
        strides=_strides_from(detector),
        score_thr=rcnn.get("score_thr", 0.05),
        iou_threshold=nms_cfg.get("iou_threshold", 0.5),
        max_per_img=rcnn.get("max_per_img", 100),
        pack=_pack_ctx(detector, variables), nms_cfg=nms_cfg)


def mask_logits_for_boxes(detector, variables, feats, boxes_in, valid):
    """Mask-head logits at externally-given input-frame boxes (B, N, 4) —
    the mask half of ``simple_test_mask`` and the building block of mask
    TTA (reference ``merge_aug_masks`` runs the mask head per aug at the
    same final boxes). Returns (B·N, S, S, C)."""
    from dsl_tpu.models.roi_heads.standard_roi_head import extract_roi_feats

    mh = detector.mask_head
    b, n = boxes_in.shape[:2]
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    flat_rois = jnp.concatenate(
        [batch_idx.reshape(-1, 1).astype(jnp.float32),
         boxes_in.reshape(-1, 4)], axis=1)
    roi_feats = extract_roi_feats(feats, flat_rois, valid.reshape(-1),
                                  _strides_from(detector), mh.roi_size)
    return detector.apply(variables, roi_feats,
                          method=detector.mask_forward)


def mask_rcnn_predict(detector, variables, images, img_shapes=None,
                      scale_factors=None, test_cfg: dict | None = None,
                      num_proposals: int = 1000):
    """Boxes + per-detection mask probabilities.

    Returns ``(dets (B, N, 5) original coords, labels, valid,
    mask_probs (B, N, 2*roi, 2*roi))``. The host pastes the 28×28
    probabilities at the boxes (``mask_head.paste_masks``), matching the
    reference's ``simple_test_mask`` (``test_mixins.py``) which re-scales
    detected boxes into the input frame for mask RoI extraction."""
    from dsl_tpu.models.roi_heads.mask_head import FCNMaskHead  # noqa: F401

    feats, (rpn_scores, rpn_deltas) = detector.apply(
        variables, images, training=False)
    tc = dict(test_cfg or detector.test_cfg or {})
    rcnn = dict(tc.get("rcnn", {}) or {})
    nms_cfg = dict(rcnn.get("nms", {}) or {})
    proposals, _, prop_valid = rpn_proposals(
        detector.rpn_head, rpn_scores, rpn_deltas, img_shapes=img_shapes,
        nms_pre=num_proposals, num_proposals=num_proposals)

    def roi_apply(v, *roi_feats):
        return detector.apply(v, *roi_feats, method=detector.roi_forward)

    dets, labels, valid = roi_head_predict(
        detector.bbox_head, roi_apply, variables, feats, proposals,
        prop_valid, img_shapes=img_shapes, scale_factors=scale_factors,
        strides=_strides_from(detector),
        score_thr=rcnn.get("score_thr", 0.05),
        iou_threshold=nms_cfg.get("iou_threshold", 0.5),
        max_per_img=rcnn.get("max_per_img", 100))

    mh = detector.mask_head
    b, n = dets.shape[:2]
    boxes_in = dets[..., :4]
    if scale_factors is not None:      # back to input-image coords
        boxes_in = boxes_in * scale_factors[:, None, :]
    logits = mask_logits_for_boxes(detector, variables, feats, boxes_in,
                                   valid)                   # (BN, S, S, C)
    if getattr(detector, "point_head", None) is not None:
        from dsl_tpu.models.roi_heads.point_rend import point_rend_refine

        s0 = logits.shape[1]
        coarse = logits.reshape(b, n, s0, s0, mh.num_classes)
        logits = point_rend_refine(
            coarse, feats[0], boxes_in, labels,
            lambda fine, cpts: detector.apply(
                variables, fine, cpts, method=detector.point_forward),
            subdivision_steps=int(tc.get("subdivision_steps", 2)),
            num_points=int(tc.get("subdivision_num_points", 196)),
            stride=_strides_from(detector)[0])
        s = logits.shape[2]
        logits = logits.reshape(b * n, s, s, mh.num_classes)
    cls = jnp.clip(labels.reshape(-1), 0, mh.num_classes - 1)
    probs = jax.nn.sigmoid(jnp.take_along_axis(
        logits, cls[:, None, None, None], axis=-1)[..., 0])
    s = logits.shape[1]
    return dets, labels, valid, probs.reshape(b, n, s, s)


@DETECTORS.register
class RPN(nn.Module):
    """Standalone RPN detector (``mmdet/models/detectors/rpn.py``):
    proposals are the detections (class-agnostic)."""

    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module
    train_cfg: Any = None
    test_cfg: Any = None

    def __call__(self, images, training: bool = False):
        feats = self.neck(self.backbone(images))
        return feats, self.rpn_head(feats, training=training)


def rpn_only_loss(detector, variables, batch, rng_key=None):
    _, rpn_out = detector.apply(variables, batch["images"], training=True)
    rpn_cfg = dict(dict(detector.train_cfg or {}).get("rpn", {}) or {})
    return _parse_losses(rpn_loss_any(detector.rpn_head, rpn_out, batch,
                                      train_cfg=rpn_cfg, rng_key=rng_key))


def rpn_only_predict(detector, variables, images, img_shapes=None,
                     scale_factors=None, num_proposals: int = 1000):
    """(dets (B, P, 5), labels zeros, valid) — proposals as detections."""
    _, rpn_out = detector.apply(variables, images, training=False)
    boxes, scores, valid = rpn_proposals_any(
        detector.rpn_head, rpn_out, img_shapes=img_shapes,
        num_proposals=num_proposals)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, :]
    dets = jnp.concatenate([boxes, scores[..., None]], axis=-1)
    return dets, jnp.zeros(scores.shape, jnp.int32), valid


@DETECTORS.register
class FastRCNN(nn.Module):
    """Fast R-CNN (``mmdet/models/detectors/fast_rcnn.py``): the RoI head
    alone — proposals come precomputed from outside."""

    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    train_cfg: Any = None
    test_cfg: Any = None

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images, training: bool = False):
        return self.extract_feat(images)

    def roi_forward(self, roi_feats):
        return self.bbox_head(roi_feats)


def fast_rcnn_predict(detector, variables, images, proposals, prop_valid,
                      img_shapes=None, scale_factors=None,
                      test_cfg: dict | None = None):
    """RoI predict on externally-supplied proposals (B, P, 4)."""
    tc = dict(test_cfg or detector.test_cfg or {})
    rcnn = dict(tc.get("rcnn", {}) or {})
    nms_cfg = dict(rcnn.get("nms", {}) or {})
    feats = detector.apply(variables, images, training=False)

    def roi_apply(v, *rf):
        return detector.apply(v, *rf, method=detector.roi_forward)

    return roi_head_predict(
        detector.bbox_head, roi_apply, variables, feats, proposals,
        prop_valid, img_shapes=img_shapes, scale_factors=scale_factors,
        strides=(4, 8, 16, 32),
        score_thr=rcnn.get("score_thr", 0.05),
        iou_threshold=nms_cfg.get("iou_threshold", 0.5),
        max_per_img=rcnn.get("max_per_img", 100))


@DETECTORS.register
class TridentFasterRCNN(TwoStageDetector):
    """Trident Faster R-CNN (``mmdet/models/detectors/trident_faster_rcnn.py``):
    the TridentResNet backbone emits ``num_branch`` weight-shared branches
    stacked along the batch axis at train time (each with a different
    receptive field); GT is tiled per branch; a single branch serves at
    test. TPU deviation (documented): the branch feature feeds an FPN-style
    neck instead of the reference's C4 + shared-res5 head."""

    num_branch: int = 3

    def __call__(self, images, training: bool = False):
        # the backbone needs the training flag: 3 branches at train,
        # ``test_branch_idx`` alone at test
        feats = self.neck(self.backbone(images, training=training))
        return feats, self.rpn_head(feats, training=training)


def trident_loss(detector, variables, batch, rng_key=None,
                 num_proposals: int = 512, num_samples: int | None = None):
    """Tile the GT per trident branch (reference duplicates images across
    branches, ``trident_faster_rcnn.py forward_train``) and reuse the
    standard two-stage loss."""
    nb = detector.num_branch
    tiled = dict(batch)
    for k in ("gt_bboxes", "gt_labels", "gt_valid", "ignore_bboxes",
              "ignore_valid", "img_shapes", "gt_mask_crops"):
        if k in tiled:
            tiled[k] = jnp.tile(
                tiled[k], (nb,) + (1,) * (tiled[k].ndim - 1))
    return two_stage_loss(detector, variables, tiled, rng_key=rng_key,
                          num_proposals=num_proposals,
                          num_samples=num_samples)
