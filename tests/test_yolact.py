"""YOLACT: head/protonet/segm forward, OHEM+mask+segm losses, predict with
proto-combined mask crops, paste semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict)
from dsl_tpu.models.dense_heads.yolact_head import (
    paste_gt_crops, yolact_full_predict)
from dsl_tpu.models.roi_heads.mask_head import GT_MASK_CROP_SIZE


def _cfg():
    return dict(
        type="YOLACT",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs="on_input"),
        bbox_head=dict(type="YOLACTHead", num_classes=4, in_channels=32,
                       feat_channels=32, num_head_convs=1, num_protos=8,
                       max_masks_to_train=16),
        segm_head=dict(type="YOLACTSegmHead", num_classes=4, in_channels=32),
        mask_head=dict(type="YOLACTProtonet", num_protos=8, in_channels=32,
                       proto_channels=(16, 16, 16)),
        test_cfg=dict(nms_pre=200, score_thr=0.05, iou_thr=0.5,
                      nms=dict(iou_threshold=0.5), max_per_img=10))


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
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
        gt_mask_crops=jnp.asarray(crops),
    )


def test_forward_loss_predict():
    det = build_detector(_cfg())
    batch = _batch()
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    total, logs = jax.jit(lambda v, b: detector_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    assert {"loss_cls", "loss_bbox", "loss_mask", "loss_segm"} <= set(logs)
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    for sub in ("bbox_head", "proto_head", "segm_head"):
        gsum = sum(float(jnp.abs(l).sum())
                   for l in jax.tree_util.tree_leaves(g["params"][sub]))
        assert np.isfinite(gsum) and gsum > 0, sub

    dets, labels, valid = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)

    dets, labels, valid, mask_crops = jax.jit(
        lambda v, im: yolact_full_predict(
            det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
            scale_factors=jnp.ones((2, 4)),
            test_cfg=_cfg()["test_cfg"]))(variables, batch["images"])
    assert mask_crops.shape == (2, 10, 56, 56)
    assert np.all(np.asarray(mask_crops) >= 0)
    assert np.all(np.asarray(mask_crops) <= 1)


def test_paste_gt_crops_geometry():
    """A full-box crop pastes exactly inside the box; a half crop covers
    the left half."""
    m = 8
    crops = jnp.ones((1, m, m))
    boxes = jnp.asarray([[16.0, 16.0, 48.0, 48.0]])
    out = paste_gt_crops(crops, boxes, jnp.asarray([1.0]), (16, 16),
                         (64, 64))
    # 64px image on a 16px canvas: box [16,48] -> canvas [4,12]
    assert float(out[0, 8, 8]) > 0.99
    assert float(out[0, 2, 2]) == 0.0
    assert float(out[0, 8, 13]) == 0.0

    half = np.zeros((1, m, m), np.float32)
    half[:, :, :m // 2] = 1
    out2 = paste_gt_crops(jnp.asarray(half), boxes, jnp.asarray([1.0]),
                          (16, 16), (64, 64))
    assert float(out2[0, 8, 5]) > 0.99     # left half of the box
    assert float(out2[0, 8, 11]) < 0.01    # right half
