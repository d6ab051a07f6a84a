"""Functional coverage for the round-3 variant surface: legacy_1.x
anchors/coder/aligned paths, SABL-cascade, HTC-without-semantic,
PISAMaskRCNN, and the SSD512 / SSD-anchor-ladder heads.

Reference surfaces: ``configs/legacy_1.x/*`` (LegacyAnchorGenerator +
LegacyDeltaXYWHBBoxCoder + RoIAlign aligned=False),
``configs/sabl/sabl_cascade_rcnn_r50_fpn_1x_coco.py``,
``configs/htc/htc_without_semantic_r50_fpn_1x_coco.py``,
``configs/pisa/pisa_mask_rcnn_r50_fpn_1x_coco.py``,
``configs/ssd/ssd512_coco.py`` / ``configs/legacy_1.x/ssd300_coco_v1.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, two_stage_loss,
    two_stage_predict)
from dsl_tpu.models.detectors.cascade_rcnn import (
    build_cascade_rcnn, cascade_rcnn_loss, cascade_rcnn_predict,
    htc_loss, htc_predict)
from dsl_tpu.models.detectors.single_stage import init_detector_variables
from dsl_tpu.models.roi_heads.mask_head import GT_MASK_CROP_SIZE

LEGACY_AG = dict(type="LegacyAnchorGenerator", center_offset=0.5,
                 scales=[8], ratios=[0.5, 1.0, 2.0],
                 strides=[4, 8, 16, 32, 64])
LEGACY_CODER = dict(type="LegacyDeltaXYWHBBoxCoder")


def _batch(b=2, size=64, k=3, masks=False):
    rng = np.random.RandomState(0)
    gt = np.zeros((b, k, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [20, 24, 56, 60]
    valid = np.zeros((b, k), bool)
    valid[:, :2] = True
    out = dict(
        images=jnp.asarray(rng.rand(b, size, size, 3), jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(np.tile([1, 2, 0], (b, 1)), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), np.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
        img_shapes=jnp.asarray([[size, size]] * b, jnp.float32))
    if masks:
        m = GT_MASK_CROP_SIZE
        crops = np.zeros((b, k, m, m), np.uint8)
        crops[:, 0] = 1
        crops[:, 1, :, :m // 2] = 1
        out["gt_mask_crops"] = jnp.asarray(crops)
    return out


def _faster_cfg(**extra):
    cfg = dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=50, base_channels=8,
                      stem_channels=8, out_indices=(0, 1, 2, 3),
                      frozen_stages=-1),
        neck=dict(type="FPN", in_channels=[32, 64, 128, 256],
                  out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      strides=[4, 8, 16, 32, 64]),
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4,
                       in_channels=32, roi_size=7, fc_channels=64))
    cfg.update(extra)
    return cfg


def test_legacy_faster_rcnn_loss_and_predict():
    """Legacy coder + legacy anchors + aligned=False RoIAlign end-to-end."""
    cfg = _faster_cfg()
    cfg["rpn_head"].update(anchor_generator=LEGACY_AG,
                           bbox_coder=LEGACY_CODER)
    cfg["bbox_head"].update(bbox_coder=LEGACY_CODER, roi_aligned=False)
    det = build_two_stage_detector(cfg)
    batch = _batch()
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0),
                                         batch["images"])
    total, logs = jax.jit(lambda v, b: two_stage_loss(
        det, v, b, num_proposals=64, num_samples=32))(variables, batch)
    assert np.isfinite(float(total)), logs
    dets, labels, valid = jax.jit(lambda v, im: two_stage_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        num_proposals=64))(variables, batch["images"])
    assert dets.shape[-1] == 5

    # aligned=False actually changes the pooled features => different boxes
    cfg2 = _faster_cfg()
    cfg2["rpn_head"].update(anchor_generator=LEGACY_AG,
                            bbox_coder=LEGACY_CODER)
    cfg2["bbox_head"].update(bbox_coder=LEGACY_CODER)  # aligned default
    det2 = build_two_stage_detector(cfg2)
    d2 = jax.jit(lambda v, im: two_stage_predict(
        det2, v, im, img_shapes=batch["img_shapes"],
        num_proposals=64))(variables, batch["images"])[0]
    assert float(jnp.abs(dets - d2).max()) > 1e-6


def test_legacy_retina_head_uses_legacy_coder():
    from dsl_tpu.models.dense_heads.retina_head import (
        RetinaHead, retina_loss)
    from dsl_tpu.core.boxes import legacy_bbox2delta, bbox2delta

    head = RetinaHead(
        num_classes=4, in_channels=8, feat_channels=8, stacked_convs=1,
        strides=(8, 16, 32, 64, 128),
        anchor_generator=dict(
            type="LegacyAnchorGenerator", center_offset=0.5,
            octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type="LegacyDeltaXYWHBBoxCoder"),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11))
    gen = head.make_anchor_generator()
    # legacy base anchors are integer-rounded (the V1.x quantization)
    ba = gen.base_anchors(0)
    np.testing.assert_allclose(ba, np.round(ba))
    feats = [jnp.zeros((1, 64 // s, 64 // s, 8)) for s in head.strides]
    v = head.init(jax.random.PRNGKey(0), feats)
    cls, reg = head.apply(v, feats)
    batch = _batch(b=1)
    losses = retina_loss(head, cls, reg, batch)
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_bbox"]))
    # the legacy encode differs from the stock encode for these anchors
    anchors = gen.flat_anchors([(64 // s, 64 // s) for s in head.strides])
    gt = jnp.broadcast_to(jnp.asarray([8.0, 8.0, 40.0, 40.0]),
                          anchors.shape)
    assert float(jnp.abs(legacy_bbox2delta(anchors, gt)
                         - bbox2delta(anchors, gt)).max()) > 1e-4


def _sabl_stage(sf):
    return dict(type="SABLHead", num_classes=4, in_channels=32, roi_size=7,
                cls_out_channels=64, reg_offset_out_channels=32,
                reg_cls_out_channels=32, num_buckets=14, scale_factor=sf)


def test_sabl_cascade_loss_and_predict():
    cfg = dict(
        type="CascadeRCNN",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=0, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      strides=[4, 8, 16, 32, 64]),
        bbox_heads=[_sabl_stage(1.7), _sabl_stage(1.5), _sabl_stage(1.3)],
        test_cfg=dict(rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                                max_per_img=8)))
    det = build_cascade_rcnn(cfg)
    batch = _batch()
    variables = init_detector_variables(det, jax.random.PRNGKey(0),
                                        batch["images"])
    total, logs = jax.jit(lambda v, b: cascade_rcnn_loss(
        det, v, b, num_proposals=64, num_samples=32))(variables, batch)
    assert np.isfinite(float(total)), logs
    for s in range(3):
        assert f"s{s}.loss_bbox_cls" in logs
        assert f"s{s}.loss_bbox_reg" in logs
    dets, labels, valid = jax.jit(lambda v, im: cascade_rcnn_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        num_proposals=64))(variables, batch["images"])
    assert dets.shape == (2, 8, 5)


def test_htc_without_semantic():
    def head(std):
        return dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                    roi_size=7, fc_channels=64, target_stds=std)

    cfg = dict(
        type="HTC",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=0, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      strides=[4, 8, 16, 32, 64]),
        bbox_heads=[head((0.1, 0.1, 0.2, 0.2)),
                    head((0.05, 0.05, 0.1, 0.1)),
                    head((0.033, 0.033, 0.067, 0.067))],
        mask_heads=[
            dict(type="HTCMaskHead", num_classes=4, in_channels=32,
                 conv_out_channels=32, num_convs=1, roi_size=14,
                 with_conv_res=False),
            dict(type="HTCMaskHead", num_classes=4, in_channels=32,
                 conv_out_channels=32, num_convs=1, roi_size=14),
            dict(type="HTCMaskHead", num_classes=4, in_channels=32,
                 conv_out_channels=32, num_convs=1, roi_size=14),
        ],
        semantic_head=None,
        test_cfg=dict(rcnn=dict(score_thr=0.01,
                                nms=dict(iou_threshold=0.5), max_per_img=8)))
    det = build_cascade_rcnn(cfg)
    assert det.semantic_head is None
    batch = _batch(masks=True)
    variables = init_detector_variables(det, jax.random.PRNGKey(0),
                                        batch["images"])
    total, logs = jax.jit(lambda v, b: htc_loss(
        det, v, b, num_proposals=64, num_samples=32))(variables, batch)
    assert np.isfinite(float(total)), logs
    assert "loss_semantic_seg" not in logs
    assert "s2.loss_mask" in logs
    dets, labels, valid, masks = jax.jit(lambda v, im: htc_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((2, 4)), num_proposals=64))(
        variables, batch["images"])
    assert dets.shape == (2, 8, 5)


def test_pisa_mask_rcnn_loss():
    cfg = _faster_cfg(
        type="PISAMaskRCNN",
        mask_head=dict(type="FCNMaskHead", num_classes=4, in_channels=32,
                       conv_out_channels=32, num_convs=1, roi_size=14),
        train_cfg=dict(isr=dict(k=2.0, bias=0.0),
                       carl=dict(k=1.0, bias=0.2)))
    det = build_two_stage_detector(cfg)
    batch = _batch(masks=True)
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0),
                                         batch["images"])
    total, logs = jax.jit(lambda v, b: two_stage_loss(
        det, v, b, num_proposals=64, num_samples=32))(variables, batch)
    assert np.isfinite(float(total)), logs
    assert "loss_mask" in logs
    assert "loss_carl" in logs or any("carl" in k for k in logs), logs


def test_ssd_ladder_head_forward_and_loss():
    from dsl_tpu.models.dense_heads.ssd_head import (
        SSDHead, ssd_loss, ssd_get_bboxes)

    head = SSDHead(
        num_classes=4, strides=[8, 16, 32, 64, 100, 300],
        anchor_generator=dict(
            type="LegacySSDAnchorGenerator", scale_major=False,
            input_size=300, basesize_ratio_range=(0.15, 0.9),
            strides=[8, 16, 32, 64, 100, 300],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]]),
        bbox_coder=dict(type="LegacyDeltaXYWHBBoxCoder",
                        target_means=[0.0, 0.0, 0.0, 0.0],
                        target_stds=[0.1, 0.1, 0.2, 0.2]))
    sizes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    feats = [jnp.zeros((1, h, w, 16)) for h, w in sizes]
    v = head.init(jax.random.PRNGKey(0), feats)
    cls, reg = head.apply(v, feats)
    # per-level anchor ladder 4/6/6/6/4/4 shows up in the conv widths
    assert [c.shape[-1] // 5 for c in cls] == [4, 6, 6, 6, 4, 4]
    batch = dict(_batch(b=1, size=304), images=None)
    losses = ssd_loss(head, cls, reg, batch)
    assert np.isfinite(float(losses["loss_cls"]))
    dets, labels, valid = ssd_get_bboxes(
        head, cls, reg, img_shapes=jnp.asarray([[300.0, 300.0]]))
    assert dets.shape[-1] == 5


def test_deformable_detr_refine_and_two_stage():
    from dsl_tpu.models.dense_heads.deformable_detr_head import (
        DeformableDETRHead, deformable_detr_loss, deformable_detr_get_bboxes)

    feats = [jax.random.normal(jax.random.PRNGKey(i), (1, s, s, 32))
             for i, s in enumerate((8, 4, 2, 1))]
    batch = dict(_batch(b=1, size=64), images=jnp.zeros((1, 64, 64, 3)))
    for refine, two_stage, extra in [(True, False, 0), (True, True, 1)]:
        head = DeformableDETRHead(
            num_classes=4, embed_dims=32, num_query=10, num_heads=4,
            num_levels=4, num_points=2, num_encoder_layers=1,
            num_decoder_layers=2, ffn_dim=32,
            with_box_refine=refine, as_two_stage=two_stage)
        v = head.init(jax.random.PRNGKey(0), feats)
        cls, box = head.apply(v, feats)
        assert cls.shape[1] == 2 + extra   # enc layer prepended (two-stage)
        assert box.shape == (1, 2 + extra, 10, 4)
        assert np.all(np.asarray(box) >= 0) and np.all(np.asarray(box) <= 1)
        losses = deformable_detr_loss(head, (cls, box), batch)
        for val in losses.values():
            assert np.isfinite(float(val)), (refine, two_stage, losses)
        dets, labels, valid = deformable_detr_get_bboxes(
            head, (cls, box), img_shapes=jnp.asarray([[64.0, 64.0]]))
        assert dets.shape[-1] == 5


def test_fovea_align_forward_loss():
    from dsl_tpu.models.dense_heads.fovea_head import FoveaHead, fovea_loss

    head = FoveaHead(num_classes=4, in_channels=32, feat_channels=32,
                     stacked_convs=1, with_deform=True,
                     norm_cfg=dict(type='GN', num_groups=32))
    feats = [jnp.zeros((1, 64 // s, 64 // s, 32))
             for s in (8, 16, 32, 64, 128)]
    v = head.init(jax.random.PRNGKey(0), feats)
    assert "align_offset" in v["params"]
    cls, reg = head.apply(v, feats)
    losses = fovea_loss(head, cls, reg, _batch(b=1))
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_bbox"]))


def test_reppoints_grid_points():
    from dsl_tpu.models.dense_heads.reppoints_head import (
        RepPointsHead, points2bbox, reppoints_loss, _grid_from_reg)

    # a 3x3 grid on the regressed box; minmax transform recovers the box
    reg = jnp.asarray([[0.1, -0.2, 0.3, 0.1]])
    prev = jnp.asarray([[-2.0, -2.0, 2.0, 2.0]])
    pts, bbox = _grid_from_reg(reg, prev)
    head = RepPointsHead(num_classes=4, transform_method="minmax",
                         use_grid_points=True)
    np.testing.assert_allclose(np.asarray(points2bbox(head, pts, None)),
                               np.asarray(bbox), atol=1e-5)

    head = RepPointsHead(num_classes=4, in_channels=32, feat_channels=32,
                         point_feat_channels=32, stacked_convs=1,
                         transform_method="minmax", use_grid_points=True)
    feats = [jnp.zeros((1, 64 // s, 64 // s, 32))
             for s in (8, 16, 32, 64, 128)]
    v = head.init(jax.random.PRNGKey(0), feats)
    outputs = head.apply(v, feats)
    assert outputs[1][0].shape[-1] == 18     # grid points, not raw reg
    losses = reppoints_loss(head, outputs, _batch(b=1))
    for val in losses.values():
        assert np.isfinite(float(val)), losses


def test_vfnet_dcn_on_last_conv():
    from dsl_tpu.models.dense_heads.vfnet_head import VFNetHead, vfnet_loss

    head = VFNetHead(num_classes=4, in_channels=32, feat_channels=32,
                     stacked_convs=2, dcn_on_last_conv=True)
    feats = [jnp.zeros((1, 128 // s, 128 // s, 32))
             for s in (8, 16, 32, 64, 128)]
    v = head.init(jax.random.PRNGKey(0), feats)
    assert any("offset" in k for k in v["params"])
    cls, reg, reg_ref = head.apply(v, feats)
    losses = vfnet_loss(head, cls, reg, reg_ref, _batch(b=1, size=128))
    for val in losses.values():
        assert np.isfinite(float(val)), losses


def test_res2net_dcn_forward():
    from dsl_tpu.models.backbones.res2net import Res2Net

    bb = Res2Net(depth=50, out_indices=(0, 1, 2, 3),
                 dcn=dict(type='DCNv2'),
                 stage_with_dcn=(False, True, True, True))
    x = jnp.zeros((1, 64, 64, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    outs = bb.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    assert any("conv2_0_offset" in "/".join(str(p) for p in path)
               for path, _ in flat)
