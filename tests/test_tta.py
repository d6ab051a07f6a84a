"""Multi-scale + flip TTA test path (merge_aug_detections / tta_test)."""

import json

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.apis.test import merge_aug_detections, tta_test
from dsl_tpu.data.datasets.coco import CocoDataset
from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import init_detector_variables


def test_merge_aug_detections_dedups_across_augs():
    # two augs found (nearly) the same box -> one kept, higher score wins
    a = (np.asarray([[10., 10., 50., 50., 0.9]], np.float32),
         np.asarray([0]))
    b = (np.asarray([[11., 10., 51., 50., 0.7],
                     [80., 80., 99., 99., 0.6]], np.float32),
         np.asarray([0, 1]))
    dets, labels = merge_aug_detections([a, b], iou_threshold=0.5)
    assert len(dets) == 2
    assert np.isclose(dets[0, 4], 0.9)          # kept the better duplicate
    assert set(labels.tolist()) == {0, 1}
    # different classes never suppress each other
    c = (np.asarray([[10., 10., 50., 50., 0.8]], np.float32),
         np.asarray([1]))
    dets2, _ = merge_aug_detections([a, c], iou_threshold=0.5)
    assert len(dets2) == 2


@pytest.mark.slow
def test_tta_test_end_to_end(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for name in ("a.jpg", "b.jpg"):
        cv2.imwrite(str(img_dir / name),
                    rng.randint(0, 255, (60, 80, 3), np.uint8))
    ann = dict(
        images=[dict(id=1, file_name="a.jpg", width=80, height=60),
                dict(id=2, file_name="b.jpg", width=80, height=60)],
        categories=[dict(id=1, name="cat"), dict(id=2, name="dog")],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 30, 30],
                 area=900, iscrowd=0),
            dict(id=2, image_id=2, category_id=2, bbox=[5, 5, 20, 30],
                 area=600, iscrowd=0)])
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    ds = CocoDataset(ann_file=str(tmp_path / "ann.json"),
                     img_prefix=str(img_dir), pipeline=[], test_mode=True)

    det = build_detector(dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=[128, 256, 512], out_channels=32,
                  start_level=0, num_outs=5),
        bbox_head=dict(type="FCOSHead", num_classes=2, in_channels=32,
                       feat_channels=32, stacked_convs=1),
        test_cfg=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                      max_per_img=10)))
    variables = init_detector_variables(
        det, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))

    results = tta_test(det, variables, ds,
                       img_scales=((96, 64), (64, 48)), flip=True,
                       canvas_hw=(96, 96), batch_size=2, evaluate=False)
    assert len(results) == 2
    for dets, labels in results:
        assert dets.shape[1] == 5
        assert len(dets) == len(labels)
        if len(dets):
            # boxes are in original-image coordinates
            assert dets[:, [0, 2]].max() <= 80 + 1e-3
            assert dets[:, [1, 3]].max() <= 60 + 1e-3

    metrics = tta_test(det, variables, ds, img_scales=((96, 64),),
                       flip=True, canvas_hw=(96, 96), batch_size=2)
    assert "bbox_mAP" in metrics


@pytest.mark.slow
def test_tta_masks_end_to_end(tmp_path):
    import cv2

    from dsl_tpu.apis.test import tta_test_masks
    from dsl_tpu.models.detectors.two_stage import (
        build_two_stage_detector, init_two_stage_variables)

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    for name in ("a.jpg", "b.jpg"):
        cv2.imwrite(str(img_dir / name),
                    rng.randint(0, 255, (60, 80, 3), np.uint8))
    ann = dict(
        images=[dict(id=1, file_name="a.jpg", width=80, height=60),
                dict(id=2, file_name="b.jpg", width=80, height=60)],
        categories=[dict(id=1, name="cat")],
        annotations=[dict(id=1, image_id=1, category_id=1,
                          bbox=[10, 10, 30, 30], area=900, iscrowd=0)])
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    ds = CocoDataset(ann_file=str(tmp_path / "ann.json"),
                     img_prefix=str(img_dir), pipeline=[], test_mode=True)

    det = build_two_stage_detector(dict(
        type="MaskRCNN",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=0, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      strides=[4, 8, 16, 32, 64]),
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=1,
                       in_channels=32, roi_size=7, fc_channels=64),
        mask_head=dict(type="FCNMaskHead", num_classes=1, in_channels=32,
                       roi_size=14),
        test_cfg=dict(rcnn=dict(score_thr=0.01,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=5))))
    variables = init_two_stage_variables(
        det, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))

    merged = tta_test(det, variables, ds, img_scales=((96, 64),),
                      flip=True, canvas_hw=(96, 96), batch_size=2,
                      max_per_img=5, evaluate=False)
    results = tta_test_masks(det, variables, ds, merged,
                             img_scales=((96, 64),), flip=True,
                             canvas_hw=(96, 96), batch_size=2,
                             max_per_img=5)
    assert len(results) == 2
    for dets, labels, masks in results:
        assert len(dets) == len(labels) == len(masks)
        for mask in masks:
            assert mask.shape == (60, 80)
            assert mask.dtype == bool or mask.dtype == np.uint8


@pytest.mark.slow
def test_tta_test_dense_exact_merge(tmp_path):
    """Reference-exact dense TTA (raw-candidate merge then ONE multiclass
    NMS): single-aug output must equal the plain predict path, multi-aug
    merges stay in original coords."""
    from dsl_tpu.apis.test import single_device_test, tta_test_dense

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    for name in ("a.jpg", "b.jpg"):
        cv2.imwrite(str(img_dir / name),
                    rng.randint(0, 255, (60, 80, 3), np.uint8))
    ann = dict(
        images=[dict(id=1, file_name="a.jpg", width=80, height=60),
                dict(id=2, file_name="b.jpg", width=80, height=60)],
        categories=[dict(id=1, name="cat"), dict(id=2, name="dog")],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 30, 30],
                 area=900, iscrowd=0)])
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    ds = CocoDataset(ann_file=str(tmp_path / "ann.json"),
                     img_prefix=str(img_dir), pipeline=[], test_mode=True)

    det = build_detector(dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=[128, 256, 512], out_channels=32,
                  start_level=0, num_outs=5),
        bbox_head=dict(type="FCOSHead", num_classes=2, in_channels=32,
                       feat_channels=32, stacked_convs=1),
        test_cfg=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                      max_per_img=10)))
    variables = init_detector_variables(
        det, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))

    # single aug: the merged-candidate path == the plain predict path
    dense = tta_test_dense(det, variables, ds, img_scales=((96, 64),),
                           flip=False, canvas_hw=(96, 96), batch_size=2,
                           evaluate=False)
    plain = single_device_test(det, variables, ds, canvas_hw=(96, 96),
                               batch_size=2, img_scale=(96, 64),
                               evaluate=False, boxes_only=True)
    for (dd, dl), (pd, pl) in zip(dense, plain):
        assert len(dd) == len(pd)
        od = np.argsort(-dd[:, 4], kind="mergesort")
        op = np.argsort(-pd[:, 4], kind="mergesort")
        np.testing.assert_allclose(dd[od], pd[op], rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(dl[od], pl[op])

    # multi-aug: merged dets stay in original coords, capped at max_per_img
    merged = tta_test_dense(det, variables, ds,
                            img_scales=((96, 64), (64, 48)), flip=True,
                            canvas_hw=(96, 96), batch_size=2,
                            evaluate=False)
    for dets, labels in merged:
        assert len(dets) <= 10 and len(dets) == len(labels)
        if len(dets):
            assert dets[:, [0, 2]].max() <= 80 + 1e-3
            assert dets[:, [1, 3]].max() <= 60 + 1e-3
