"""Config-driven forward sweep: one flagship config per family COMPUTES.

Reference parity: ``tests/test_models/test_forward.py`` runs train + test
forwards from real config files for every family. The build-only sweep
(``test_configs_build.py``) proves every config *parses and builds*; this
suite proves the flagship of each family *runs*: the real config file's
model dict (knobs and all) flows through ``build_detector`` →
``init_detector_variables`` → ``detector_loss`` + ``detector_predict`` on a
tiny synthetic batch, asserting finite losses and well-formed detections.

Models run FULL-SIZE (the config's own channels/depths) at 64x64 so the
config's knobs are exercised verbatim; only the hourglass families get a
shrunk backbone (190M-param init is too slow for CI) — their head knobs
still come from the config file.
"""

import copy
import glob
import os.path as osp

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dsl_tpu.config import Config
from dsl_tpu.models.detectors.single_stage import (
    build_detector, detector_loss, detector_predict, init_detector_variables)
from dsl_tpu.models.roi_heads.mask_head import GT_MASK_CROP_SIZE

CFG_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "configs")

TINY_HOURGLASS = dict(
    backbone=dict(type="HourglassNet", downsample_times=3, num_stacks=2,
                  stage_channels=[16, 16, 24, 24], feat_channel=16,
                  stage_blocks=[1, 1, 1, 1]),
    bbox_head=dict(in_channels=16, num_feat_levels=2))

# family dir -> (flagship config, model-dict overrides, image size)
FLAGSHIPS = {
    "albu_example": ("mask_rcnn_r50_fpn_albu_1x_coco.py", None, 64),
    "atss": ("atss_r50_fpn_1x_coco.py", None, 64),
    "autoassign": ("autoassign_r50_fpn_8x2_1x_coco.py", None, 64),
    "carafe": ("faster_rcnn_r50_fpn_carafe_1x_coco.py", None, 64),
    "cascade_rcnn": ("cascade_rcnn_r50_fpn_1x_coco.py", None, 64),
    "cascade_rpn": ("crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py", None, 64),
    "centernet": ("centernet_resnet18_dcnv2_140e_coco.py", None, 64),
    "centripetalnet": (
        "centripetalnet_hourglass104_mstest_16x6_210e_coco.py",
        TINY_HOURGLASS, 64),
    "cityscapes": ("faster_rcnn_r50_fpn_1x_cityscapes.py", None, 64),
    "cornernet": ("cornernet_hourglass104_mstest_10x5_210e_coco.py",
                  TINY_HOURGLASS, 64),
    "dcn": ("faster_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py", None, 64),
    "deepfashion": ("mask_rcnn_r50_fpn_15e_deepfashion.py", None, 64),
    "deformable_detr": ("deformable_detr_r50_16x2_50e_coco.py", None, 64),
    "detectors": ("detectors_htc_r50_1x_coco.py", None, 64),
    "detr": ("detr_r50_8x2_150e_coco.py", None, 64),
    "double_heads": ("dh_faster_rcnn_r50_fpn_1x_coco.py", None, 64),
    "dynamic_rcnn": ("dynamic_rcnn_r50_fpn_1x_coco.py", None, 64),
    "empirical_attention": (
        "faster_rcnn_r50_fpn_attention_0010_1x_coco.py", None, 64),
    "fast_rcnn": ("fast_rcnn_r50_fpn_1x_coco.py", None, 64),
    "faster_rcnn": ("faster_rcnn_r50_fpn_1x_coco.py", None, 64),
    "fcos": ("fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_"
             "gn-head_1x_coco.py", None, 64),
    "fcos_semi": ("RLA_r50_caffe_mslonger_tricks_0.Xdata_unlabel_dynamic_"
                  "lw_nofuse_iterlabel_si-soft_singlestage.py", None, 64),
    "foveabox": ("fovea_r50_fpn_4x4_1x_coco.py", None, 64),
    "fp16": ("faster_rcnn_r50_fpn_fp16_1x_coco.py", None, 64),
    "fpg": ("faster_rcnn_r50_fpg_crop640_50e_coco.py", None, 64),
    "free_anchor": ("retinanet_free_anchor_r50_fpn_1x_coco.py", None, 64),
    "fsaf": ("fsaf_r50_fpn_1x_coco.py", None, 64),
    "gcnet": ("mask_rcnn_r50_fpn_r16_gcb_c3-c5_1x_coco.py", None, 64),
    "gfl": ("gfl_r50_fpn_1x_coco.py", None, 64),
    "ghm": ("retinanet_ghm_r50_fpn_1x_coco.py", None, 64),
    "gn": ("mask_rcnn_r50_fpn_gn-all_2x_coco.py", None, 64),
    "gn+ws": ("faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py", None, 64),
    "grid_rcnn": ("grid_rcnn_r50_fpn_gn-head_1x_coco.py", None, 64),
    "groie": ("faster_rcnn_r50_fpn_groie_1x_coco.py", None, 64),
    "guided_anchoring": ("ga_retinanet_r50_caffe_fpn_1x_coco.py", None, 64),
    "hrnet": ("faster_rcnn_hrnetv2p_w18_1x_coco.py", None, 64),
    "htc": ("htc_r50_fpn_1x_coco.py", None, 64),
    "instaboost": ("mask_rcnn_r50_fpn_instaboost_4x_coco.py", None, 64),
    "ld": ("ld_r18_gflv1_r101_fpn_coco_1x.py", None, 64),
    "legacy_1.x": ("retinanet_r50_fpn_1x_coco_v1.py", None, 64),
    "libra_rcnn": ("libra_faster_rcnn_r50_fpn_1x_coco.py", None, 64),
    "lvis": ("mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py", None, 64),
    "mask_rcnn": ("mask_rcnn_r50_fpn_1x_coco.py", None, 64),
    "ms_rcnn": ("ms_rcnn_r50_caffe_fpn_1x_coco.py", None, 64),
    "nas_fcos": ("nas_fcos_fcoshead_r50_caffe_fpn_gn-head_4x4_1x_coco.py",
                 None, 64),
    "nas_fpn": ("retinanet_r50_nasfpn_crop640_50e_coco.py", None, 128),
    "paa": ("paa_r50_fpn_1x_coco.py", None, 64),
    "pafpn": ("faster_rcnn_r50_pafpn_1x_coco.py", None, 64),
    "pascal_voc": ("faster_rcnn_r50_fpn_1x_voc0712.py", None, 64),
    "pisa": ("pisa_faster_rcnn_r50_fpn_1x_coco.py", None, 64),
    "point_rend": ("point_rend_r50_caffe_fpn_mstrain_1x_coco.py", None, 64),
    "regnet": ("mask_rcnn_regnetx-3.2GF_fpn_1x_coco.py", None, 64),
    "reppoints": ("reppoints_moment_r50_fpn_1x_coco.py", None, 64),
    "res2net": ("faster_rcnn_r2_101_fpn_2x_coco.py", None, 64),
    "resnest": ("faster_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_"
                "1x_coco.py", None, 64),
    "retinanet": ("retinanet_r50_fpn_1x_coco.py", None, 64),
    "rpn": ("rpn_r50_fpn_1x_coco.py", None, 64),
    "sabl": ("sabl_retinanet_r50_fpn_1x_coco.py", None, 64),
    "scnet": ("scnet_r50_fpn_1x_coco.py", None, 64),
    "scratch": ("faster_rcnn_r50_fpn_gn-all_scratch_6x_coco.py", None, 64),
    "seesaw_loss": ("mask_rcnn_r50_fpn_random_seesaw_loss_normed_mask_"
                    "mstrain_2x_lvis_v1.py", None, 64),
    "selfsup_pretrain": ("mask_rcnn_r50_fpn_mocov2-pretrain_1x_coco.py",
                         None, 64),
    "sparse_rcnn": ("sparse_rcnn_r50_fpn_1x_coco.py", None, 64),
    "ssd": ("ssd300_coco.py", None, 128),
    "tridentnet": ("tridentnet_r50_caffe_1x_coco.py", None, 64),
    "vfnet": ("vfnet_r50_fpn_1x_coco.py", None, 64),
    "wider_face": ("ssd300_wider_face.py", None, 128),
    "yolact": ("yolact_r50_1x8_coco.py", None, 64),
    "yolo": ("yolov3_d53_mstrain-608_273e_coco.py", None, 64),
    "yolof": ("yolof_r50_c5_8x8_1x_coco.py", None, 64),
}


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def _make_batch(b, size, num_classes):
    rng = np.random.RandomState(0)
    k = 4
    gt = np.zeros((b, k, 4), np.float32)
    gt[:, 0] = [size * 0.1, size * 0.1, size * 0.6, size * 0.65]
    gt[:, 1] = [size * 0.3, size * 0.35, size * 0.9, size * 0.95]
    valid = np.zeros((b, k), bool)
    valid[:, :2] = True
    labels = np.zeros((b, k), np.int32)
    labels[:, 1] = min(1, num_classes - 1)
    m = GT_MASK_CROP_SIZE
    crops = np.zeros((b, k, m, m), np.uint8)
    crops[:, 0] = 1
    crops[:, 1, :, :m // 2] = 1
    box_area = ((gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1]))
    mask_areas = crops.mean((2, 3)).astype(np.float32) * box_area
    return dict(
        images=jnp.asarray(rng.rand(b, size, size, 3), jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(labels),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
        gt_mask_crops=jnp.asarray(crops),
        gt_mask_areas=jnp.asarray(mask_areas),
        img_shapes=jnp.asarray([[size, size]] * b, jnp.float32),
        scale_factors=jnp.ones((b, 4), jnp.float32),
    )


def test_every_family_has_a_flagship():
    fams = {osp.basename(d.rstrip("/")) for d in
            glob.glob(osp.join(CFG_DIR, "*/"))} - {"_base_", "common"}
    assert fams == set(FLAGSHIPS), (
        f"missing: {fams - set(FLAGSHIPS)}; stale: {set(FLAGSHIPS) - fams}")


@pytest.mark.parametrize("family", sorted(FLAGSHIPS),
                         ids=lambda f: f)
def test_flagship_computes(family):
    fname, overrides, size = FLAGSHIPS[family]
    path = osp.join(CFG_DIR, family, fname)
    assert osp.exists(path), f"flagship {path} missing"
    cfg = Config.fromfile(path)
    model_cfg = copy.deepcopy(dict(cfg.model))
    if overrides:
        _merge(model_cfg, copy.deepcopy(overrides))
    det = build_detector(model_cfg)

    head = getattr(det, "bbox_head", None)
    if head is None and getattr(det, "bbox_heads", None):
        head = det.bbox_heads[0]
    nc = head.num_classes if head is not None else 1
    b = 1
    batch = _make_batch(b, size, nc)
    variables = init_detector_variables(
        det, jax.random.PRNGKey(0), batch["images"])

    det_name = type(det).__name__
    if det_name == "RPN":
        from dsl_tpu.models.detectors.two_stage import (
            rpn_only_loss, rpn_only_predict)

        total, logs = rpn_only_loss(det, variables, batch)
        assert np.isfinite(float(total)), f"{family}: rpn loss not finite"
        dets, _, _ = rpn_only_predict(
            det, variables, batch["images"], img_shapes=batch["img_shapes"],
            scale_factors=batch["scale_factors"], num_proposals=16)
        assert dets.shape[-1] == 5
        return
    if det_name == "FastRCNN":
        # trained from precomputed proposals (reference proposal files);
        # loss == RoI head loss on external proposals
        from dsl_tpu.models.roi_heads.standard_roi_head import roi_head_loss
        from dsl_tpu.models.detectors.two_stage import fast_rcnn_predict

        prng = np.random.RandomState(1)
        x1 = prng.rand(b, 28, 1) * size * 0.5
        y1 = prng.rand(b, 28, 1) * size * 0.5
        props = jnp.asarray(np.concatenate(
            [x1, y1, x1 + 8 + prng.rand(b, 28, 1) * size * 0.4,
             y1 + 8 + prng.rand(b, 28, 1) * size * 0.4], -1), jnp.float32)
        pvalid = jnp.ones((b, 28), bool)
        feats = det.apply(variables, batch["images"], training=True)

        def roi_apply(v, *rf):
            return det.apply(v, *rf, method=det.roi_forward)

        losses = roi_head_loss(det.bbox_head, roi_apply, variables, feats,
                               props, pvalid, batch, jax.random.PRNGKey(0),
                               strides=(4, 8, 16, 32), num_samples=16)
        for k, v in losses.items():
            if "loss" in k:
                assert np.isfinite(float(v)), f"{family}: {k} not finite"
        dets, _, _ = fast_rcnn_predict(
            det, variables, batch["images"], props, pvalid,
            img_shapes=batch["img_shapes"],
            scale_factors=batch["scale_factors"])
        assert dets.shape[-1] == 5
        return

    total, logs = detector_loss(det, variables, batch)
    assert np.isfinite(float(total)), f"{family}: loss not finite ({logs})"
    assert any("loss" in k for k in logs)

    out = detector_predict(det, variables, batch["images"],
                           img_shapes=batch["img_shapes"],
                           scale_factors=batch["scale_factors"],
                           test_cfg=model_cfg.get("test_cfg"))
    dets = out[0]
    assert dets.ndim == 3 and dets.shape[-1] == 5, f"{family}: bad dets"
    assert bool(np.isfinite(np.asarray(dets)).all()), f"{family}: NaN dets"
