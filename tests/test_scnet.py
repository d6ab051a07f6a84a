"""SCNet: global-context loss, feature relay, full cascade+mask e2e."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.detectors.cascade_rcnn import (
    build_cascade_rcnn, scnet_loss, scnet_predict)
from dsl_tpu.models.detectors.single_stage import init_detector_variables
from dsl_tpu.models.roi_heads.mask_head import GT_MASK_CROP_SIZE
from dsl_tpu.models.roi_heads.scnet import global_context_loss


def _head(std):
    return dict(type="SCNetBBoxHead", num_classes=4, in_channels=32,
                roi_size=7, fc_channels=64, target_stds=std)


CFG = dict(
    type="SCNet",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=0, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  strides=[4, 8, 16, 32, 64]),
    bbox_heads=[_head((0.1, 0.1, 0.2, 0.2)),
                _head((0.05, 0.05, 0.1, 0.1)),
                _head((0.033, 0.033, 0.067, 0.067))],
    mask_head=dict(type="SCNetMaskHead", num_classes=4, in_channels=32,
                   conv_out_channels=32, num_convs=2, roi_size=14),
    semantic_head=dict(type="FusedSemanticHead", num_ins=5, fusion_level=1,
                       num_convs=1, in_channels=32, conv_out_channels=32,
                       num_classes=6, loss_weight=0.2),
    glbctx_head=dict(type="GlobalContextHead", num_convs=2, in_channels=32,
                     conv_out_channels=32, num_classes=4, loss_weight=3.0,
                     conv_to_res=True),
    relay_head=dict(type="FeatureRelayHead", in_channels=64,
                    out_conv_channels=32, roi_feat_size=7, scale_factor=2),
    test_cfg=dict(rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                            max_per_img=8)),
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
        gt_labels=jnp.asarray(np.tile([1, 2, 0], (b, 1)), jnp.int32),
        gt_valid=jnp.asarray(valid),
        gt_mask_crops=jnp.asarray(crops),
        img_shapes=jnp.asarray([[size, size]] * b, jnp.float32),
    )


def test_global_context_loss():
    logits = jnp.zeros((2, 4))
    labels = jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32)
    valid = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    loss = global_context_loss(logits, labels, valid, 4, loss_weight=1.0)
    np.testing.assert_allclose(float(loss), np.log(2), rtol=1e-5)


def test_scnet_train_and_predict():
    det = build_cascade_rcnn(CFG)
    batch = _batch()
    variables = init_detector_variables(det, jax.random.PRNGKey(0),
                                        batch["images"])
    total, logs = jax.jit(
        lambda v, b: scnet_loss(det, v, b, num_proposals=64,
                                num_samples=32))(variables, batch)
    assert np.isfinite(float(total)), logs
    assert {"loss_semantic_seg", "loss_glbctx", "loss_mask",
            "s2.loss_cls"} <= set(logs)
    g = jax.grad(lambda v: scnet_loss(det, v, batch, num_proposals=64,
                                      num_samples=32)[0])(variables)
    for sub in ("glbctx_head", "relay_head", "mask_head"):
        gsum = sum(float(jnp.abs(l).sum())
                   for l in jax.tree_util.tree_leaves(g["params"][sub]))
        assert np.isfinite(gsum) and gsum > 0, sub

    dets, labels, valid, masks = jax.jit(lambda v, im: scnet_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((2, 4)), num_proposals=64))(
        variables, batch["images"])
    assert dets.shape == (2, 8, 5)
    assert masks.shape[:2] == (2, 8)
