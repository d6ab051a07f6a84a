import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models.detectors.cascade_rcnn import (
    build_cascade_rcnn, cascade_rcnn_loss, cascade_rcnn_predict)

CFG = dict(
    type="CascadeRCNN",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=0, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  strides=[4, 8, 16, 32, 64]),
    bbox_heads=[
        dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
             roi_size=7, fc_channels=32,
             target_stds=[0.1, 0.1, 0.2, 0.2]),
        dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
             roi_size=7, fc_channels=32,
             target_stds=[0.05, 0.05, 0.1, 0.1]),
    ],
    test_cfg=dict(rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                            max_per_img=10)),
)


def _setup():
    det = build_cascade_rcnn(CFG)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                       jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    roi_feats = jnp.zeros((4, 7, 7, 32))
    params = dict(variables["params"])
    for stage in range(len(det.bbox_heads)):
        rv = det.init(jax.random.PRNGKey(stage + 1), roi_feats, stage,
                      method=det.roi_forward)
        params.update(rv["params"])
    return det, {**variables, "params": params}, imgs


def test_cascade_loss_stages():
    det, variables, imgs = _setup()
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[8., 8., 30., 30.]]]),
        gt_labels=jnp.asarray([[1], [2]], jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
        img_shapes=jnp.asarray([[64., 64.]] * 2),
    )
    total, log_vars = cascade_rcnn_loss(det, variables, batch,
                                        rng_key=jax.random.PRNGKey(3),
                                        num_proposals=64, num_samples=32)
    assert np.isfinite(float(total))
    for k in ("loss_rpn_cls", "s0.loss_cls", "s1.loss_cls", "s0.loss_bbox"):
        assert k in log_vars, sorted(log_vars)
        assert np.isfinite(float(log_vars[k]))


def test_cascade_predict():
    det, variables, imgs = _setup()
    dets, labels, valid = cascade_rcnn_predict(
        det, variables, imgs, img_shapes=jnp.asarray([[64., 64.]] * 2),
        scale_factors=jnp.ones((2, 4)), num_proposals=64)
    assert dets.shape == (2, 10, 5)
    assert labels.shape == (2, 10)


def test_cascade_mask_rcnn():
    """Cascade + shared mask head: per-stage mask losses, full-tree init."""
    from dsl_tpu.models.detectors.cascade_rcnn import (
        build_cascade_rcnn, cascade_rcnn_loss)
    from dsl_tpu.models.detectors.single_stage import init_detector_variables
    from dsl_tpu.models.roi_heads.mask_head import GT_MASK_CROP_SIZE

    cfg = dict(CFG)
    cfg["mask_head"] = dict(type="FCNMaskHead", num_classes=4,
                            in_channels=32, conv_out_channels=32,
                            num_convs=2, roi_size=14)
    det = build_cascade_rcnn(cfg)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = init_detector_variables(det, jax.random.PRNGKey(0), imgs)
    assert "mask_head" in variables["params"]

    crops = np.zeros((2, 2, GT_MASK_CROP_SIZE, GT_MASK_CROP_SIZE), np.uint8)
    crops[:, 0] = 1
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4.0, 4.0, 30.0, 30.0], [0.0] * 4]] * 2),
        gt_labels=jnp.zeros((2, 2), jnp.int32),
        gt_valid=jnp.asarray([[True, False]] * 2),
        ignore_bboxes=jnp.zeros((2, 1, 4), jnp.float32),
        ignore_valid=jnp.zeros((2, 1), bool),
        gt_mask_crops=jnp.asarray(crops))
    total, logs = jax.jit(lambda v, b: cascade_rcnn_loss(
        det, v, b, rng_key=jax.random.PRNGKey(0), num_proposals=32,
        num_samples=16))(variables, batch)
    assert np.isfinite(float(total))
    assert {"s0.loss_mask", "s1.loss_mask"} <= set(logs)  # 2-stage test cfg
