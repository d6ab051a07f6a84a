import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.assigners import atss_assign, max_iou_assign
from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict)
from dsl_tpu.models.detectors.multi_head import (
    build_multi_head_detector, multi_head_loss, multi_head_predict)


def test_anchor_generator_base_and_grid():
    gen = AnchorGenerator(strides=[8], ratios=[1.0], scales=[2.0])
    base = gen.base_anchors(0)
    # 8 * 2 = 16px square centered at origin
    np.testing.assert_allclose(base, [[-8, -8, 8, 8]])
    grid = gen.grid_anchors_level((2, 2), 0)
    assert grid.shape == (4, 4)
    np.testing.assert_allclose(grid[1], [0, -8, 16, 8])  # shifted by stride


def test_anchor_generator_octave_scales():
    gen = AnchorGenerator(strides=[8, 16], ratios=[0.5, 1.0, 2.0],
                          octave_base_scale=4, scales_per_octave=3)
    assert gen.num_base_anchors == 9
    base = gen.base_anchors(0)
    assert base.shape == (9, 4)
    # ratio=1, scale=4 anchor on stride 8: 32px square
    ws = base[:, 2] - base[:, 0]
    assert any(abs(w - 32) < 1e-3 for w in ws)


def test_max_iou_assigner():
    anchors = jnp.asarray([[0, 0, 10, 10], [0, 0, 9, 9], [50, 50, 60, 60],
                           [100, 100, 110, 110]], jnp.float32)
    gt = jnp.asarray([[[0., 0., 10., 10.], [48., 48., 62., 62.]]])
    gt_labels = jnp.asarray([[3, 7]], jnp.int32)
    gt_valid = jnp.ones((1, 2), bool)
    labels, assigned, weights, max_iou = max_iou_assign(
        anchors, gt, gt_labels, gt_valid, pos_iou_thr=0.5, neg_iou_thr=0.4,
        num_classes=80)
    assert int(labels[0, 0]) == 3          # exact match -> pos
    assert int(labels[0, 3]) == 80         # far away -> bg
    assert int(labels[0, 2]) == 7          # IoU(50..60 vs 48..62) > 0.5
    # anchor1 iou ~0.81 -> positive too
    assert int(labels[0, 1]) == 3


def test_max_iou_low_quality_match():
    # gt with max IoU 0.3 to any anchor: forced positive via min_pos_iou
    anchors = jnp.asarray([[0, 0, 10, 10], [40, 40, 60, 60]], jnp.float32)
    gt = jnp.asarray([[[0., 0., 20., 16.]]])   # IoU with anchor0 ~0.31
    gt_labels = jnp.asarray([[5]], jnp.int32)
    gt_valid = jnp.ones((1, 1), bool)
    labels, *_ = max_iou_assign(anchors, gt, gt_labels, gt_valid,
                                pos_iou_thr=0.5, neg_iou_thr=0.4,
                                min_pos_iou=0.0, num_classes=80,
                                match_low_quality=True)
    assert int(labels[0, 0]) == 5
    labels2, *_ = max_iou_assign(anchors, gt, gt_labels, gt_valid,
                                 pos_iou_thr=0.5, neg_iou_thr=0.4,
                                 num_classes=80, match_low_quality=False)
    assert int(labels2[0, 0]) == 80


def test_atss_assigner_runs():
    gen = AnchorGenerator(strides=[8, 16], ratios=[1.0], scales=[8.0])
    sizes = [(8, 8), (4, 4)]
    anchors = gen.flat_anchors(sizes)
    npl = gen.num_anchors(sizes)
    gt = jnp.asarray([[[8., 8., 40., 40.]]])
    labels, assigned, w, miou = atss_assign(
        anchors, npl, gt, jnp.asarray([[2]], jnp.int32),
        jnp.ones((1, 1), bool), topk=9, num_classes=20)
    assert (np.asarray(labels[0]) == 2).sum() > 0     # some positives
    assert (np.asarray(labels[0]) == 20).sum() > 0    # mostly background


RETINA_CFG = dict(
    type="RetinaNet",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=1, add_extra_convs="on_input", num_outs=5),
    bbox_head=dict(type="RetinaHead", num_classes=4, in_channels=32,
                   feat_channels=32, stacked_convs=1,
                   strides=[8, 16, 32, 64, 128]),
    test_cfg=dict(nms_pre=100, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=10),
)


def test_retinanet_forward_loss_predict():
    det = build_detector(RETINA_CFG)
    imgs = jnp.zeros((2, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    cls_scores, bbox_preds = det.apply(variables, imgs, training=True)
    assert len(cls_scores) == 5
    assert cls_scores[0].shape == (2, 8, 8, 9 * 4)
    assert bbox_preds[0].shape == (2, 8, 8, 9 * 4)

    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[0., 0., 0., 0.]]]),
        gt_labels=jnp.asarray([[1], [0]], jnp.int32),
        gt_valid=jnp.asarray([[True], [False]]),
    )
    total, log_vars = detector_loss(det, variables, batch)
    assert np.isfinite(float(total))
    assert "loss_cls" in log_vars and "loss_bbox" in log_vars
    g = jax.grad(lambda p: detector_loss(
        det, {**variables, "params": p}, batch)[0])(variables["params"])
    assert any(float(jnp.abs(l).sum()) > 0
               for l in jax.tree_util.tree_leaves(g))

    dets, labels, valid = detector_predict(
        det, variables, imgs, img_shapes=jnp.asarray([[64., 64.]] * 2),
        scale_factors=jnp.ones((2, 4)))
    assert dets.shape == (2, 10, 5)


def test_multi_head_detector():
    cfg = dict(
        type="FCOSMultiHead",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        necks=[dict(type="FPN", in_channels=[64, 128, 256, 512],
                    out_channels=32, start_level=1,
                    add_extra_convs="on_output", num_outs=5,
                    relu_before_extra_convs=True)] * 2,
        bbox_heads=[dict(type="FCOSHead", num_classes=4, in_channels=32,
                         stacked_convs=1, feat_channels=32,
                         strides=[8, 16, 32, 64, 128], norm_on_bbox=True,
                         centerness_on_reg=True, center_sampling=True)] * 2,
        test_cfg=dict(nms_pre=50, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=10),
    )
    det = build_multi_head_detector(cfg)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    outs = det.apply(variables, imgs, training=True)
    assert len(outs) == 2 and len(outs[0]) == 3

    batch = dict(images=imgs,
                 gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]]]),
                 gt_labels=jnp.asarray([[1]], jnp.int32),
                 gt_valid=jnp.ones((1, 1), bool))
    total, log_vars = multi_head_loss(det, variables, batch)
    assert np.isfinite(float(total))
    assert "loss_cls" in log_vars and "loss_cls_h1" in log_vars

    dets, labels, valid = multi_head_predict(
        det, variables, imgs, img_shapes=jnp.asarray([[64., 64.]]),
        scale_factors=jnp.ones((1, 4)))
    assert dets.shape == (1, 10, 5)


def test_atss_head_forward_loss_predict():
    cfg = dict(
        type="ATSS",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type="ATSSHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128], topk=9),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=10),
    )
    det = build_detector(cfg)
    imgs = jnp.zeros((2, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    cls_scores, bbox_preds, cents = det.apply(variables, imgs, training=True)
    assert cls_scores[0].shape == (2, 8, 8, 4)
    assert cents[0].shape == (2, 8, 8, 1)

    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[0., 0., 0., 0.]]]),
        gt_labels=jnp.asarray([[1], [0]], jnp.int32),
        gt_valid=jnp.asarray([[True], [False]]),
    )
    total, log_vars = detector_loss(det, variables, batch)
    assert np.isfinite(float(total))
    assert "loss_centerness" in log_vars
    dets, labels, valid = detector_predict(
        det, variables, imgs, img_shapes=jnp.asarray([[64., 64.]] * 2),
        scale_factors=jnp.ones((2, 4)))
    assert dets.shape == (2, 10, 5)


def test_gfl_losses_and_head():
    from dsl_tpu.core.losses import (distribution_focal_loss,
                                     quality_focal_loss)

    # DFL golden: target exactly on a bin -> pure CE on that bin
    logits = jnp.asarray([[0.0, 5.0, 0.0, 0.0]])
    loss = float(distribution_focal_loss(logits, jnp.asarray([1.0]),
                                         reduction="sum"))
    expect = -np.log(np.exp(5.0) / (3 + np.exp(5.0)))
    assert abs(loss - expect) < 1e-4
    # QFL: perfect prediction of the quality -> near-zero loss
    ql = quality_focal_loss(jnp.asarray([[20.0, -20.0]]),
                            jnp.asarray([0]), jnp.asarray([1.0]),
                            reduction="sum")
    assert float(ql) < 1e-3

    cfg = dict(
        type="GFL",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type="GFLHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1, reg_max=8,
                       strides=[8, 16, 32, 64, 128]),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=10),
    )
    det = build_detector(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                       jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    cls_scores, bbox_dists = det.apply(variables, imgs, training=True)
    assert bbox_dists[0].shape == (2, 8, 8, 4 * 9)

    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[0., 0., 0., 0.]]]),
        gt_labels=jnp.asarray([[1], [0]], jnp.int32),
        gt_valid=jnp.asarray([[True], [False]]),
    )
    total, log_vars = detector_loss(det, variables, batch)
    assert np.isfinite(float(total))
    assert "loss_dfl" in log_vars
    dets, labels, valid = detector_predict(
        det, variables, imgs, img_shapes=jnp.asarray([[64., 64.]] * 2),
        scale_factors=jnp.ones((2, 4)))
    assert dets.shape == (2, 10, 5)


def test_ssd_head_hard_negative_mining():
    cfg = dict(
        type="SSD",
        backbone=dict(type="MobileNetV2", out_indices=(1, 2, 4, 6)),
        neck=dict(type="FPN", in_channels=[24, 32, 96, 320],
                  out_channels=32, start_level=0,
                  add_extra_convs="on_output", num_outs=5),
        bbox_head=dict(type="SSDHead", num_classes=4,
                       strides=[4, 8, 16, 32, 64],
                       anchor_scales=[4.0]),
        test_cfg=dict(nms_pre=100, score_thr=0.02,
                      nms=dict(iou_threshold=0.45), max_per_img=10),
    )
    det = build_detector(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                       jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    cls_scores, bbox_preds = det.apply(variables, imgs, training=True)
    assert cls_scores[0].shape[-1] == 3 * 5      # 3 ratios * (4 cls + 1 bg)

    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[0., 0., 0., 0.]]]),
        gt_labels=jnp.asarray([[1], [0]], jnp.int32),
        gt_valid=jnp.asarray([[True], [False]]),
    )
    total, log_vars = detector_loss(det, variables, batch)
    assert np.isfinite(float(total))
    dets, labels, valid = detector_predict(
        det, variables, imgs, img_shapes=jnp.asarray([[64., 64.]] * 2),
        scale_factors=jnp.ones((2, 4)))
    assert dets.shape == (2, 10, 5)


def test_yolov3_family():
    cfg = dict(
        type="YOLOV3",
        backbone=dict(type="Darknet", depth=53, out_indices=(3, 4, 5)),
        neck=dict(type="YOLOV3Neck", in_channels=[256, 512, 1024],
                  out_channels=[128, 256, 512]),
        bbox_head=dict(type="YOLOV3Head", num_classes=4,
                       in_channels=[512, 256, 128]),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.45), max_per_img=10),
    )
    det = build_detector(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                       jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    preds = det.apply(variables, imgs, training=True)
    assert len(preds) == 3
    assert preds[0].shape == (1, 2, 2, 3 * 9)     # stride 32, 3 anchors

    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]]]),
        gt_labels=jnp.asarray([[1]], jnp.int32),
        gt_valid=jnp.ones((1, 1), bool),
    )
    total, log_vars = detector_loss(det, variables, batch)
    assert np.isfinite(float(total))
    assert "loss_conf" in log_vars and "loss_wh" in log_vars
    dets, labels, valid = detector_predict(
        det, variables, imgs, img_shapes=jnp.asarray([[64., 64.]]),
        scale_factors=jnp.ones((1, 4)))
    assert dets.shape == (1, 10, 5)
