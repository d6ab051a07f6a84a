"""PISA (ISR-P/CARL) + LD (localization distillation) tiny-tensor tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.core.pisa import (carl_weights, group_rank_desc, isr_p_weights)
from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict, init_detector_variables)


def test_group_rank_desc():
    g = jnp.asarray([0, 0, 0, 1, 1, 2])
    s = jnp.asarray([0.2, 0.9, 0.5, 0.1, 0.7, 0.3])
    v = jnp.ones((6,), bool)
    r = group_rank_desc(g, s, v)
    np.testing.assert_array_equal(np.asarray(r), [2, 0, 1, 1, 0, 0])


def test_isr_weights_rank_monotone():
    """Higher-IoU positives of the same class/gt get larger weights."""
    labels = jnp.asarray([1, 1, 1, 4])   # 3 positives class 1, 1 bg (nc=4)
    pos = jnp.asarray([True, True, True, False])
    gids = jnp.asarray([0, 0, 0, 0])
    ious = jnp.asarray([0.9, 0.6, 0.75, 0.0])
    w = isr_p_weights(labels, pos, gids, ious, num_classes=4, k=2.0,
                      bias=0.0)
    w = np.asarray(w)
    assert w[0] > w[2] > w[1]
    assert w[3] == 1.0


def test_carl_weights_sum_to_num_pos():
    logits = jnp.asarray(np.random.RandomState(0).randn(6, 4), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1])
    pos = jnp.asarray([True, True, True, False, False, False])
    w = carl_weights(logits, labels, pos, 4)
    np.testing.assert_allclose(float(w.sum()), 3.0, rtol=1e-5)
    assert float(w[3]) == 0.0


def _batch(b=2, size=64, k=3):
    gt = np.zeros((b, k, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [24, 24, 60, 60]
    valid = np.zeros((b, k), bool)
    valid[:, :2] = True
    return dict(
        images=jnp.asarray(np.random.RandomState(0).rand(b, size, size, 3),
                           jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(np.tile([1, 0, 0], (b, 1)), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
    )


def test_pisa_retina_forward_loss_predict():
    cfg = dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="PISARetinaHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.5), max_per_img=10))
    det = build_detector(cfg)
    batch = _batch()
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    total, logs = jax.jit(lambda v, bb: detector_loss(det, v, bb))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    assert "loss_carl" in logs
    dets, labels, valid = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)


def test_ld_teacher_student():
    student_head = dict(type="LDHead", num_classes=4, in_channels=32,
                        feat_channels=32, stacked_convs=1, reg_max=8)
    teacher = dict(
        type="GFL",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type="GFLHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1, reg_max=8))
    cfg = dict(
        type="KnowledgeDistillationSingleStageDetector",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=student_head,
        teacher_config=teacher,
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=10))
    det = build_detector(cfg)
    batch = _batch()
    variables = init_detector_variables(det, jax.random.PRNGKey(0),
                                        batch["images"])
    total, logs = jax.jit(lambda v, bb: detector_loss(det, v, bb))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    assert "loss_ld" in logs
    # teacher gets no gradient from the distillation loss
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    tsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["teacher"]))
    assert tsum == pytest.approx(0.0, abs=1e-8)
    ssum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["bbox_head"]))
    assert ssum > 0

    dets, labels, valid = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)
