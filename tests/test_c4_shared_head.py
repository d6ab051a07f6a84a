"""Faster R-CNN C4 (shared res5 head + avg-pool bbox head) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, two_stage_loss,
    two_stage_predict)


CFG = dict(
    type="FasterRCNNC4",
    backbone=dict(type="ResNet", depth=18, out_indices=(2,)),
    neck=dict(type="IdentityNeck"),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=64,
                  strides=[16]),
    shared_head=dict(type="ResLayerSharedHead", depth=50, stage=3),
    bbox_head=dict(type="BBoxHeadAvgPool", num_classes=4, in_channels=256,
                   roi_size=14),
    test_cfg=dict(rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                            max_per_img=10)),
)


def test_c4_shared_head_loss_and_predict():
    det = build_two_stage_detector(CFG)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                       jnp.float32)
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0), imgs)
    # shared head params exist
    assert any(k.startswith("shared_head") or "block0" in str(k)
               for k in variables["params"])
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[8., 8., 30., 30.]]]),
        gt_labels=jnp.asarray([[1], [2]], jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
        img_shapes=jnp.asarray([[64., 64.]] * 2),
    )
    total, log = two_stage_loss(det, variables, batch,
                                rng_key=jax.random.PRNGKey(3),
                                num_proposals=32, num_samples=16)
    assert np.isfinite(float(total))
    for k in ("loss_rpn_cls", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(log[k]))

    g = jax.grad(lambda p: two_stage_loss(
        det, {**variables, "params": p}, batch,
        rng_key=jax.random.PRNGKey(3), num_proposals=32,
        num_samples=16)[0])(variables["params"])
    sh = g["shared_head"]
    leaf = jax.tree_util.tree_leaves(sh)
    assert sum(float(jnp.abs(x).sum()) for x in leaf) > 0

    dets, labels, valid = two_stage_predict(
        det, variables, imgs, img_shapes=batch["img_shapes"],
        num_proposals=32)
    assert dets.shape == (2, 10, 5)


def test_res_layer_shared_head_shape():
    from dsl_tpu.models.roi_heads.shared_heads import ResLayerSharedHead

    sh = ResLayerSharedHead(depth=50, stage=3, stride=2)
    x = jnp.zeros((3, 14, 14, 1024))
    variables = sh.init(jax.random.PRNGKey(0), x)
    out = sh.apply(variables, x)
    assert out.shape == (3, 7, 7, 2048)   # res5: stride 2, 512*4 channels

def test_mask_c4_init_shared_head_channels():
    """MaskRCNNC4's mask_forward re-enters the shared res5 head, so the
    side init must feed it C4 channels (bh.in_channels), not the mask
    head's post-shared-head in_channels — a 2048-vs-1024 ScopeParamShapeError
    otherwise (init_two_stage_variables; reference mask_rcnn_r50_caffe_c4)."""
    cfg = dict(
        type="MaskRCNNC4",
        backbone=dict(type="ResNet", depth=18, out_indices=(2,)),
        neck=dict(type="IdentityNeck"),
        rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=64,
                      strides=[16]),
        shared_head=dict(type="ResLayerSharedHead", depth=50, stage=3),
        bbox_head=dict(type="BBoxHeadAvgPool", num_classes=4,
                       in_channels=256, roi_size=14),
        mask_head=dict(type="FCNMaskHead", num_classes=4, in_channels=2048,
                       conv_out_channels=64, num_convs=0, roi_size=14),
        test_cfg=dict(rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10, mask_thr_binary=0.5)),
    )
    det = build_two_stage_detector(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                       jnp.float32)
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0), imgs)
    # the shared head's first conv must match the C4 channel count (256
    # for this tiny r18), NOT the mask head's declared 2048
    k = variables["params"]["shared_head"]["block0"]["conv1"]["kernel"]
    assert k.shape[2] == 256

    from dsl_tpu.models.roi_heads.mask_head import GT_MASK_CROP_SIZE
    m = GT_MASK_CROP_SIZE
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]]]),
        gt_labels=jnp.asarray([[1]], jnp.int32),
        gt_valid=jnp.ones((1, 1), bool),
        gt_mask_crops=jnp.ones((1, 1, m, m), jnp.uint8),
        gt_mask_areas=jnp.asarray([[36. * 36.]]),
        img_shapes=jnp.asarray([[64., 64.]]),
    )
    total, log = two_stage_loss(det, variables, batch,
                                rng_key=jax.random.PRNGKey(3),
                                num_proposals=32, num_samples=16)
    assert np.isfinite(float(total))
    assert np.isfinite(float(log["loss_mask"]))
