"""Guided Anchoring: loc-region targets, guided anchors, GA-Retina
forward/loss/predict, bounded IoU loss."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.core.losses import bounded_iou_loss
from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict)


def test_bounded_iou_zero_at_match():
    box = jnp.asarray([[10.0, 10.0, 50.0, 60.0]])
    loss = bounded_iou_loss(box, box, reduction="sum")
    assert float(loss) < 1e-6
    shifted = box + jnp.asarray([[4.0, 0.0, 4.0, 0.0]])
    assert float(bounded_iou_loss(shifted, box, reduction="sum")) > 0


def test_loc_targets_regions():
    from dsl_tpu.models.dense_heads.ga_retina_head import (
        GARetinaHead, _loc_targets)

    head = GARetinaHead(num_classes=4, strides=(8, 16, 32, 64, 128),
                        octave_base_scale=4)
    # gt of scale 32 -> log2(32/32)+0.5 floor = 0 -> level 0 (stride 8)
    gt = jnp.asarray([[[16.0, 16.0, 48.0, 48.0]]])
    valid = jnp.asarray([[True]])
    sizes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    tw, avg = _loc_targets(head, gt, valid, sizes)
    t0, w0 = tw[0]
    # center of the gt (4, 4) on the stride-8 map is positive
    assert float(t0[0, 4, 4]) == 1.0 and float(w0[0, 4, 4]) == 1.0
    # far corner is background with weight 0.1
    assert float(t0[0, 0, 0]) == 0.0
    np.testing.assert_allclose(float(w0[0, 0, 0]), 0.1, rtol=1e-5)
    # level 1 gets an ignore ring (weight 0) at the gt center
    t1, w1 = tw[1]
    assert float(t1[0, 2, 2]) == 0.0 and float(w1[0, 2, 2]) == 0.0
    assert avg > 0


def test_ga_retina_forward_loss_predict():
    cfg = dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="GARetinaHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.5), max_per_img=10))
    det = build_detector(cfg)
    b = 2
    gt = np.zeros((b, 3, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [24, 24, 60, 60]
    valid = np.zeros((b, 3), bool)
    valid[:, :2] = True
    batch = dict(
        images=jnp.asarray(np.random.RandomState(0).rand(b, 64, 64, 3),
                           jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(np.tile([1, 0, 0], (b, 1)), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
    )
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    total, logs = jax.jit(lambda v, bb: detector_loss(det, v, bb))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    assert {"loss_cls", "loss_bbox", "loss_shape", "loss_loc"} <= set(logs)
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["bbox_head"]))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, vmask = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * b),
        scale_factors=jnp.ones((b, 4))))(variables, batch["images"])
    assert dets.shape == (b, 10, 5)
