"""PointRend: coarse head shapes, point target sampling, importance point
selection, train loss with point branch, refined mask predict."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.roi_heads.point_rend import (
    point_rend_refine, point_targets_from_crops, uncertain_points_train)
from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, mask_rcnn_predict,
    two_stage_loss)
from dsl_tpu.models.roi_heads.mask_head import GT_MASK_CROP_SIZE

CFG = dict(
    type="PointRend",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=0, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  strides=[4, 8, 16, 32, 64]),
    bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                   roi_size=7, fc_channels=64),
    mask_head=dict(type="CoarseMaskHead", num_classes=4, in_channels=32,
                   roi_size=14, num_convs=0, num_fcs=2, fc_out_channels=64,
                   downsample_factor=2),
    point_head=dict(type="MaskPointHead", num_classes=4, num_fcs=3,
                    in_channels=32, fc_channels=32),
    test_cfg=dict(rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                            max_per_img=8),
                  subdivision_steps=2, subdivision_num_points=32),
)


def _batch(b=2, size=64, k=3):
    rng = np.random.RandomState(0)
    gt = np.zeros((b, k, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [20, 24, 56, 60]
    valid = np.zeros((b, k), bool)
    valid[:, :2] = True
    m = GT_MASK_CROP_SIZE
    crops = np.zeros((b, k, m, m), np.uint8)
    crops[:, 0] = 1
    crops[:, 1, :, :m // 2] = 1
    return dict(
        images=jnp.asarray(rng.rand(b, size, size, 3), jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, k), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
        gt_mask_crops=jnp.asarray(crops),
        img_shapes=jnp.asarray([[size, size]] * b, jnp.float32),
    )


def test_point_targets_sampling():
    """Points inside the gt box read the crop; outside read 0."""
    m = 16
    crops = jnp.ones((1, m, m))
    gt = jnp.asarray([[10.0, 10.0, 30.0, 30.0]])
    roi = jnp.asarray([[0.0, 0.0, 40.0, 40.0]])
    pts = jnp.asarray([[[0.5, 0.5],       # abs (20, 20) inside gt
                        [0.05, 0.05]]])   # abs (2, 2) outside gt
    t = point_targets_from_crops(crops, gt, roi, pts)
    assert float(t[0, 0]) > 0.99
    assert float(t[0, 1]) == 0.0


def test_uncertain_points_prefer_low_margin():
    """Points land preferentially where |logit| is small."""
    n, s, c = 1, 8, 3
    logits = np.full((n, s, s, c), 10.0, np.float32)
    logits[0, 4, 4, :] = 0.0                       # one uncertain cell
    pts = uncertain_points_train(jax.random.PRNGKey(0),
                                 jnp.asarray(logits), jnp.zeros((n,),
                                                                jnp.int32),
                                 num_points=16, importance_ratio=0.75)
    assert pts.shape == (1, 16, 2)
    # the importance points (first 12) cluster near cell (4,4) ~ (0.56, 0.56)
    d = np.abs(np.asarray(pts[0, :12]) - 9 / 16.0).max(axis=-1)
    assert (d < 0.25).mean() > 0.5


def test_point_rend_train_and_predict():
    det = build_two_stage_detector(CFG)
    batch = _batch()
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0),
                                         batch["images"])
    total, logs = jax.jit(
        lambda v, b: two_stage_loss(det, v, b, num_proposals=64,
                                    num_samples=32))(variables, batch)
    assert np.isfinite(float(total)), logs
    assert "loss_point" in logs and "loss_mask" in logs
    g = jax.grad(lambda v: two_stage_loss(det, v, batch, num_proposals=64,
                                          num_samples=32)[0])(variables)
    for sub in ("mask_head", "point_head"):
        gsum = sum(float(jnp.abs(l).sum())
                   for l in jax.tree_util.tree_leaves(g["params"][sub]))
        assert np.isfinite(gsum) and gsum > 0, sub

    dets, labels, valid, masks = jax.jit(lambda v, im: mask_rcnn_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((2, 4)), num_proposals=64))(
        variables, batch["images"])
    # coarse 7 -> two subdivision steps -> 28
    assert masks.shape == (2, 8, 28, 28)
    assert np.all(np.asarray(masks) >= 0) and np.all(np.asarray(masks) <= 1)
