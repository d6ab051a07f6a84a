"""TridentFasterRCNN: branch-tiled training + single-branch test."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, trident_loss,
    two_stage_predict)

CFG = dict(
    type="TridentFasterRCNN",
    backbone=dict(type="TridentResNet", depth=50, stem_channels=8,
                  num_branch=3, test_branch_idx=1),
    neck=dict(type="ChannelMapper", in_channels=[1024], out_channels=32,
              num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  strides=[16, 32, 64, 128, 256]),
    bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                   roi_size=7, fc_channels=64),
    test_cfg=dict(rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                            max_per_img=10)),
)


def test_trident_frcnn():
    det = build_two_stage_detector(CFG)
    b = 2
    gt = np.zeros((b, 3, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    valid = np.zeros((b, 3), bool)
    valid[:, 0] = True
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
        lambda v, bb: trident_loss(det, v, bb, num_proposals=32,
                                   num_samples=16))(variables, batch)
    assert np.isfinite(float(total)), logs
    # test-time single branch: standard predict with batch-size B outputs
    dets, labels, vmask = jax.jit(lambda v, im: two_stage_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((b, 4)), num_proposals=32))(
        variables, batch["images"])
    assert dets.shape == (b, 10, 5)
