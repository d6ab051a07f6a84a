"""Cascade RPN: region assignment + two-stage refinement in Faster R-CNN."""

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
    rpn_head=dict(type="CascadeRPNHead", in_channels=32, feat_channels=32,
                  strides=[4, 8, 16, 32, 64], anchor_scale=8.0),
    bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                   roi_size=7, fc_channels=64),
    test_cfg=dict(rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                            max_per_img=10)),
)


def test_region_assign_centers():
    from dsl_tpu.models.dense_heads.cascade_rpn_head import (
        CascadeRPNHead, _region_assign)

    head = CascadeRPNHead(strides=(4, 8, 16, 32, 64), anchor_scale=8.0)
    # gt scale 32 -> log2(32/32)+.5 -> level 0 (stride 4)
    gt = jnp.asarray([[[16.0, 16.0, 48.0, 48.0]]])
    valid = jnp.asarray([[True]])
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    lvl_anchors = head.make_anchor_generator().grid_anchors(sizes)
    a = _region_assign(head, lvl_anchors, sizes, gt, valid)
    a0 = np.asarray(a[0, :256]).reshape(16, 16)
    assert a0[8, 8] == 0           # gt center location positive
    assert a0[0, 0] == -1


def test_cascade_rpn_faster_rcnn():
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
    assert {"loss_rpn_reg_s1", "loss_rpn_cls", "loss_rpn_reg_s2"} <= \
        set(logs)
    g = jax.grad(lambda v: two_stage_loss(det, v, batch, num_proposals=64,
                                          num_samples=32)[0])(variables)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["rpn_head"]))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, vmask = jax.jit(lambda v, im: two_stage_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((b, 4)), num_proposals=64))(
        variables, batch["images"])
    assert dets.shape == (b, 10, 5)
