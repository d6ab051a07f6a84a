"""Instance-segmentation tier: FCNMaskHead, device mask targets, Mask R-CNN
train/test forward, RLE round-trip, segm COCO eval."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.core.masks import (
    BitmapMasks, decode_rle, encode_rle, mask_iou, mask_target, rle_area)
from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, mask_rcnn_predict,
    two_stage_loss)
from dsl_tpu.models.roi_heads.mask_head import (
    GT_MASK_CROP_SIZE, gt_mask_crop, mask_head_loss, mask_targets_from_crops,
    paste_masks)

CFG = dict(
    type="MaskRCNN",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=0, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  strides=[4, 8, 16, 32, 64]),
    bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                   roi_size=7, fc_channels=64),
    mask_head=dict(type="FCNMaskHead", num_classes=4, in_channels=32,
                   conv_out_channels=32, num_convs=2, roi_size=14),
    test_cfg=dict(rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                            max_per_img=10)),
)


def _batch(b=2, size=64, k=4):
    rng = np.random.RandomState(0)
    gt = np.zeros((b, k, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [20, 24, 56, 60]
    valid = np.zeros((b, k), bool)
    valid[:, :2] = True
    crops = np.zeros((b, k, GT_MASK_CROP_SIZE, GT_MASK_CROP_SIZE), np.uint8)
    # instance 0: full box; instance 1: left half of its box
    crops[:, 0] = 1
    crops[:, 1, :, :GT_MASK_CROP_SIZE // 2] = 1
    # full-instance pixel areas consistent with the crops (MaskIoU head)
    areas = np.zeros((b, k), np.float32)
    areas[:, 0] = 32 * 32
    areas[:, 1] = 36 * 18
    return dict(
        gt_mask_areas=jnp.asarray(areas),
        images=jnp.asarray(rng.rand(b, size, size, 3), jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, k), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
        gt_mask_crops=jnp.asarray(crops),
        img_shapes=jnp.asarray([[size, size]] * b, jnp.float32),
    )


def _setup():
    det = build_two_stage_detector(CFG)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0), imgs)
    return det, variables


# -- RLE / mask utilities -----------------------------------------------


def test_rle_roundtrip():
    rng = np.random.RandomState(3)
    m = (rng.rand(23, 17) > 0.6).astype(np.uint8)
    rle = encode_rle(m)
    assert rle["size"] == [23, 17]
    assert rle_area(rle) == int(m.sum())
    np.testing.assert_array_equal(decode_rle(rle), m)
    # all-zero and all-one masks
    z = np.zeros((5, 4), np.uint8)
    np.testing.assert_array_equal(decode_rle(encode_rle(z)), z)
    o = np.ones((5, 4), np.uint8)
    np.testing.assert_array_equal(decode_rle(encode_rle(o)), o)


def test_mask_iou_crowd():
    a = np.zeros((1, 10, 10), np.uint8)
    a[0, :5] = 1                       # 50 px
    b = np.zeros((2, 10, 10), np.uint8)
    b[0, :5] = 1                       # identical
    b[1, :10] = 1                      # superset (100 px)
    iou = mask_iou(a, b, np.asarray([False, False]))
    assert abs(iou[0, 0] - 1.0) < 1e-9
    assert abs(iou[0, 1] - 0.5) < 1e-9
    iou_c = mask_iou(a, b, np.asarray([False, True]))
    assert abs(iou_c[0, 1] - 1.0) < 1e-9   # crowd: inter / dt area


def test_device_mask_targets_match_host():
    """Device resampling from per-GT crops ≈ host crop+resize
    (reference mask_target semantics)."""
    rng = np.random.RandomState(0)
    h = w = 64
    full = np.zeros((h, w), np.uint8)
    full[10:40, 8:48] = 1
    full[20:30, 20:30] = 0             # a hole, to make it nontrivial
    gt_box = np.asarray([8.0, 10.0, 48.0, 40.0])
    gm = BitmapMasks([full], h, w)

    crops = np.zeros((1, 1, GT_MASK_CROP_SIZE, GT_MASK_CROP_SIZE), np.float32)
    crops[0, 0] = (gt_mask_crop(full, gt_box) >= 0.5)

    for roi in ([10.0, 12.0, 44.0, 38.0], [0.0, 0.0, 60.0, 60.0],
                [20.0, 18.0, 34.0, 33.0]):
        roi = np.asarray(roi)
        host = mask_target(gm, roi[None], np.asarray([0]), mask_size=28)[0]
        dev = np.asarray(mask_targets_from_crops(
            jnp.asarray(crops), jnp.asarray(gt_box, jnp.float32).reshape(
                1, 1, 4),
            jnp.asarray(roi, jnp.float32).reshape(1, 4),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            mask_size=28))[0]
        agree = (host == dev).mean()
        assert agree > 0.92, f"host/device mask targets diverge: {agree}"


def test_mask_head_loss_learns_signal():
    logits = jnp.full((3, 28, 28, 4), 5.0)       # confident foreground
    targets = jnp.ones((3, 28, 28))
    labels = jnp.zeros((3,), jnp.int32)
    w = jnp.ones((3,))
    good = mask_head_loss(logits, targets, labels, w, 4)
    bad = mask_head_loss(-logits, targets, labels, w, 4)
    assert float(good) < 0.01 < float(bad)
    # non-positive rois contribute nothing
    none = mask_head_loss(logits, targets, labels, jnp.zeros((3,)), 4)
    assert float(none) == 0.0


# -- Mask R-CNN end-to-end ------------------------------------------------


def test_mask_rcnn_train_loss_jits():
    det, variables = _setup()
    batch = _batch()

    @jax.jit
    def loss_fn(v, b):
        total, logs = two_stage_loss(det, v, b,
                                     rng_key=jax.random.PRNGKey(0),
                                     num_proposals=64, num_samples=32)
        return total, logs

    total, logs = loss_fn(variables, batch)
    assert np.isfinite(float(total))
    assert "loss_mask" in logs and np.isfinite(float(logs["loss_mask"]))
    # mask loss actually differentiates mask-head params
    g = jax.grad(lambda v: loss_fn(v, batch)[0])(variables)
    mk = g["params"]["mask_head"]["conv_logits"]["kernel"]
    assert float(jnp.abs(mk).sum()) > 0


def test_mask_rcnn_predict_shapes():
    det, variables = _setup()
    imgs = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3),
                       jnp.float32)
    dets, labels, valid, probs = mask_rcnn_predict(
        det, variables, imgs,
        img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
        scale_factors=jnp.ones((2, 4)), num_proposals=50)
    assert dets.shape == (2, 10, 5)
    assert probs.shape == (2, 10, 28, 28)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))


def test_paste_masks():
    probs = np.ones((1, 28, 28), np.float32)
    boxes = np.asarray([[10.0, 20.0, 30.0, 50.0, 0.9]])
    out = paste_masks(probs, boxes, 60, 40)
    assert out.shape == (1, 60, 40)
    assert out[0, 30, 20] == 1 and out[0, 10, 5] == 0
    assert int(out.sum()) == (30 - 10) * (50 - 20)


def test_detector_loss_dispatches_two_stage():
    """Two-stage detectors train through the standard detector_loss path."""
    from dsl_tpu.models.detectors.single_stage import detector_loss

    det, variables = _setup()
    total, logs = jax.jit(
        lambda v, b: detector_loss(det, v, b, cur_iter=3))(
        variables, _batch())
    assert np.isfinite(float(total))
    assert {"loss_rpn_cls", "loss_cls", "loss_mask"} <= set(logs)


# -- segm COCO eval --------------------------------------------------------


def _square_poly(x1, y1, x2, y2):
    return [[x1, y1, x2, y1, x2, y2, x1, y2]]


def test_segm_coco_eval_perfect_and_partial(tmp_path):
    import json

    from dsl_tpu.data.datasets.coco import CocoDataset

    gt = dict(
        images=[dict(id=1, file_name="a.jpg", width=64, height=64)],
        categories=[dict(id=1, name="thing")],
        annotations=[dict(id=1, image_id=1, category_id=1,
                          bbox=[8, 8, 24, 24], area=576, iscrowd=0,
                          segmentation=_square_poly(8, 8, 32, 32))])
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(gt))
    ds = CocoDataset(ann_file=str(p), pipeline=[], classes=("thing",),
                     test_mode=True)

    mask = np.zeros((64, 64), np.uint8)
    mask[8:32, 8:32] = 1
    dets = np.asarray([[8.0, 8.0, 32.0, 32.0, 0.95]])
    labels = np.asarray([0])
    res = [(dets, labels, mask[None])]
    m = ds.evaluate(res, metric=["bbox", "segm"], verbose=False)
    assert m["segm_mAP"] > 0.99 and m["bbox_mAP"] > 0.99

    # half-covering mask: IoU 0.5 -> only low thresholds match
    half = np.zeros((64, 64), np.uint8)
    half[8:32, 8:20] = 1
    m2 = ds.evaluate([(dets, labels, half[None])], metric="segm",
                     verbose=False)
    assert 0.0 < m2["segm_mAP"] < 0.2
    assert m2["segm_mAP_50"] > 0.99   # IoU 0.5 still matches at thr .5


def test_corner_pool_and_carafe_and_point_sample():
    from dsl_tpu.ops.misc_ops import carafe, corner_pool, point_sample

    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    # bottom pool: running max downward
    bp = np.asarray(corner_pool(x, "bottom"))[0, :, 0, 0]
    np.testing.assert_array_equal(bp, [0, 4, 8, 12])
    tp = np.asarray(corner_pool(x, "top"))[0, :, 0, 0]
    np.testing.assert_array_equal(tp, [12, 12, 12, 12])
    rp = np.asarray(corner_pool(x, "right"))[0, 0, :, 0]
    np.testing.assert_array_equal(rp, [0, 1, 2, 3])
    lp = np.asarray(corner_pool(x, "left"))[0, 0, :, 0]
    np.testing.assert_array_equal(lp, [3, 3, 3, 3])

    # CARAFE with a delta kernel at the center tap == nearest upsample
    masks = jnp.zeros((1, 8, 8, 25)).at[..., 12].set(1.0)
    up = np.asarray(carafe(x, masks, kernel_size=5, scale=2))
    np.testing.assert_allclose(up[0, ::2, ::2, 0],
                               np.asarray(x)[0, :, :, 0])

    pts = jnp.asarray([[[0.5, 0.5]]])     # center of a 4x4 map
    v = float(point_sample(x, pts)[0, 0, 0])
    assert abs(v - np.asarray(x)[0].mean()) < 3.0   # near the map center


def test_mask_scoring_rcnn_train_and_iou_target():
    from dsl_tpu.models.roi_heads.maskiou_head import mask_iou_target

    # iou target: identical masks -> 1; disjoint -> 0
    pred = jnp.ones((1, 4, 4))
    tgt = jnp.ones((1, 4, 4))
    assert float(mask_iou_target(pred, tgt, jnp.ones(1))[0]) == 1.0
    assert float(mask_iou_target(pred, jnp.zeros((1, 4, 4)),
                                 jnp.ones(1))[0]) == 0.0

    cfg = dict(CFG)
    cfg["type"] = "MaskScoringRCNN"
    cfg["mask_iou_head"] = dict(type="MaskIoUHead", num_classes=4,
                                in_channels=32, conv_out_channels=32,
                                num_convs=2, fc_out_channels=64)
    det = build_two_stage_detector(cfg)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0), imgs)
    total, logs = jax.jit(lambda v, b: two_stage_loss(
        det, v, b, rng_key=jax.random.PRNGKey(0), num_proposals=64,
        num_samples=32))(variables, _batch())
    assert np.isfinite(float(total))
    assert "loss_mask_iou" in logs and np.isfinite(float(logs["loss_mask_iou"]))


def test_mask_head_normed_predictor():
    """predictor_cfg=NormedConv2d (seesaw *_normed_mask configs): logits are
    temperature-scaled cosine similarities, bounded by the temperature."""
    from dsl_tpu.models.roi_heads.mask_head import FCNMaskHead

    head = FCNMaskHead(num_classes=4, in_channels=8, conv_out_channels=8,
                       num_convs=1, roi_size=14,
                       predictor_cfg=dict(type="NormedConv2d", tempearture=20))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 14, 14, 8))
    v = head.init(jax.random.PRNGKey(1), x)
    y = head.apply(v, x)
    assert y.shape == (2, 28, 28, 4)
    assert float(jnp.abs(y).max()) <= 20.0 + 1e-3
    with pytest.raises(ValueError):
        FCNMaskHead(num_classes=4, in_channels=8,
                    predictor_cfg=dict(type="Bogus")).init(
                        jax.random.PRNGKey(0), x)
