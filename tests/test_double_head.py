"""Double-Head R-CNN: conv-reg/fc-cls split head with 1.3x reg rois."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.roi_heads.double_bbox_head import scale_rois
from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, two_stage_loss,
    two_stage_predict)

CFG = dict(
    type="DoubleHeadRCNN",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=0, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  strides=[4, 8, 16, 32, 64]),
    bbox_head=dict(type="DoubleConvFCBBoxHead", num_classes=4,
                   in_channels=32, roi_size=7, num_convs=1, num_fcs=2,
                   conv_out_channels=32, fc_out_channels=64,
                   reg_roi_scale_factor=1.3),
    test_cfg=dict(rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                            max_per_img=10)),
)


def test_scale_rois():
    r = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
    s = scale_rois(r, 2.0)
    np.testing.assert_allclose(np.asarray(s[0]), [0, 10, 40, 50], atol=1e-5)


def test_double_head_train_and_predict():
    det = build_two_stage_detector(CFG)
    rng = np.random.RandomState(0)
    b = 2
    gt = np.zeros((b, 3, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [20, 24, 56, 60]
    valid = np.zeros((b, 3), bool)
    valid[:, :2] = True
    batch = dict(
        images=jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, 3), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
        img_shapes=jnp.asarray([[64, 64]] * b, jnp.float32),
    )
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0),
                                         batch["images"])
    total, logs = jax.jit(
        lambda v, bb: two_stage_loss(det, v, bb, num_proposals=64,
                                     num_samples=32))(variables, batch)
    assert np.isfinite(float(total)), logs
    assert "loss_bbox" in logs and "loss_cls" in logs
    g = jax.grad(lambda v: two_stage_loss(det, v, batch, num_proposals=64,
                                          num_samples=32)[0])(variables)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["bbox_head"]))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, vmask = jax.jit(lambda v, im: two_stage_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((b, 4)), num_proposals=64))(
        variables, batch["images"])
    assert dets.shape == (b, 10, 5)
