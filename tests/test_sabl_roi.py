"""SABL two-stage bbox head: forward contract + Faster R-CNN e2e."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, two_stage_loss,
    two_stage_predict)

CFG = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=0, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  strides=[4, 8, 16, 32, 64]),
    bbox_head=dict(type="SABLHead", num_classes=4, in_channels=32,
                   roi_size=7, cls_out_channels=64,
                   reg_cls_out_channels=16, reg_offset_out_channels=16,
                   num_buckets=14, scale_factor=1.7),
    test_cfg=dict(rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                            max_per_img=10)),
)


def test_sabl_head_shapes():
    from dsl_tpu.models.roi_heads.sabl_head import SABLHead

    head = SABLHead(num_classes=4, in_channels=8, roi_size=7,
                    cls_out_channels=16, reg_cls_out_channels=8,
                    reg_offset_out_channels=8)
    x = jnp.zeros((3, 7, 7, 8))
    variables = head.init(jax.random.PRNGKey(0), x)
    cls, (bc, bo) = head.apply(variables, x)
    assert cls.shape == (3, 5)
    assert bc.shape == bo.shape == (3, 28)      # 4 sides x side_num 7


def test_sabl_faster_rcnn():
    det = build_two_stage_detector(CFG)
    b = 2
    gt = np.zeros((b, 3, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [20, 24, 56, 60]
    valid = np.zeros((b, 3), bool)
    valid[:, :2] = True
    batch = dict(
        images=jnp.asarray(np.random.RandomState(0).rand(b, 64, 64, 3),
                           jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, 3), jnp.int32),
        gt_valid=jnp.asarray(valid),
        img_shapes=jnp.asarray([[64, 64]] * b, jnp.float32),
    )
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0),
                                         batch["images"])
    total, logs = jax.jit(
        lambda v, bb: two_stage_loss(det, v, bb, num_proposals=64,
                                     num_samples=32))(variables, batch)
    assert np.isfinite(float(total)), logs
    assert {"loss_bbox_cls", "loss_bbox_reg"} <= set(logs)
    dets, labels, vmask = jax.jit(lambda v, im: two_stage_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((b, 4)), num_proposals=64))(
        variables, batch["images"])
    assert dets.shape == (b, 10, 5)
