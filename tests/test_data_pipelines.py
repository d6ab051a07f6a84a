import numpy as np
import pytest

from dsl_tpu.data.pipelines.transforms import (
    Normalize, Pad, PatchShuffle, RandomFlip, Resize, ZeroIgnore)
from dsl_tpu.data.pipelines.strong_aug import (
    RandomAugmentBBox, UBAug, apply_color_policy, cutout, random_affine)
from dsl_tpu.data.formatting import build_batch, format_sample


def _results(h=100, w=200, boxes=None, labels=None):
    r = dict(img=np.random.RandomState(0).randint(
        0, 255, (h, w, 3), np.uint8).astype(np.float32))
    r["img_shape"] = r["img"].shape
    r["ori_shape"] = r["img"].shape
    r["bbox_fields"] = []
    if boxes is not None:
        r["gt_bboxes"] = np.asarray(boxes, np.float32)
        r["gt_labels"] = np.asarray(labels if labels is not None
                                    else [0] * len(boxes), np.int64)
        r["gt_bboxes_ignore"] = np.zeros((0, 4), np.float32)
        r["bbox_fields"] = ["gt_bboxes", "gt_bboxes_ignore"]
    return r


def test_resize_keep_ratio_and_boxes():
    r = _results(100, 200, boxes=[[10, 10, 50, 50]])
    out = Resize(img_scale=(100, 50), keep_ratio=True)(r)
    # factor = min(100/200, 50/100) = 0.5
    assert out["img"].shape[:2] == (50, 100)
    np.testing.assert_allclose(out["gt_bboxes"][0], [5, 5, 25, 25])
    np.testing.assert_allclose(out["scale_factor"], [0.5, 0.5, 0.5, 0.5])


def test_resize_multiscale_value_mode():
    r = _results(100, 200)
    t = Resize(img_scale=[(100, 50), (200, 100)], multiscale_mode="value")
    out = t(r)
    assert out["scale_idx"] in (0, 1)
    assert out["scale"] in [(100, 50), (200, 100)]


def test_random_flip_boxes():
    r = _results(100, 200, boxes=[[10, 20, 50, 60]])
    r["flip"] = True
    r["flip_direction"] = "horizontal"
    out = RandomFlip(flip_ratio=1.0)(r)
    np.testing.assert_allclose(out["gt_bboxes"][0], [150, 20, 190, 60])


def test_normalize_to_rgb():
    r = _results(4, 4)
    img_bgr = r["img"].copy()
    out = Normalize(mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True)(r)
    np.testing.assert_allclose(out["img"][..., 0], img_bgr[..., 2])


def test_pad_divisor():
    r = _results(100, 200)
    out = Pad(size_divisor=32)(r)
    assert out["img"].shape[:2] == (128, 224)
    assert out["pad_shape"][:2] == (128, 224)


def test_patch_shuffle_flip_box_remap():
    # deterministic: ranges collapse to a point -> place = 0.5
    np.random.seed(0)
    r = _results(100, 200, boxes=[[10, 10, 50, 50], [90, 10, 130, 50]])
    t = PatchShuffle(ratio=1.0, ranges=[0.5, 0.5], mode=["flip"])
    out = t(r)
    assert out["PS"] is True
    # crop_w = 100; left piece moved right by w-crop_w=100
    # box1 [10,10,50,50] wholly left -> [110,10,150,50]
    boxes = out["gt_bboxes"]
    assert [110, 10, 150, 50] in boxes.tolist()
    # box2 straddles seam x=100 -> split into two boxes (3 boxes total)
    assert len(boxes) == 3
    assert len(out["gt_labels"]) == 3


def test_patch_shuffle_none_when_ratio_zero():
    r = _results(100, 200, boxes=[[10, 10, 50, 50]])
    out = PatchShuffle(ratio=0.0)(r)
    assert out["PS"] is False


def test_zero_ignore_blanks_region():
    r = _results(50, 50, boxes=[[0, 0, 10, 10]])
    r["gt_bboxes_ignore"] = np.asarray([[30, 30, 45, 45]], np.float32)
    out = ZeroIgnore(ratio=1.0)(r)
    assert np.all(out["img"][35:44, 35:44] == 0)
    assert not np.all(out["img"][:10, :10] == 0)  # gt region untouched


def test_color_ops_preserve_shape():
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    for op in ("Identity", "AutoContrast", "Equalize", "Solarize", "Color",
               "Contrast", "Brightness", "Sharpness", "Posterize"):
        out = apply_color_policy(img, op, 1.0, 5)
        assert out.shape == img.shape


def test_random_affine_boxes_stay_boxes():
    np.random.seed(1)
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.asarray([[10, 10, 30, 30]], np.float32)
    out, b = random_affine(img, boxes)
    assert out.shape == img.shape
    assert b.shape == (1, 4)
    assert np.all(b[:, 2] >= b[:, 0]) and np.all(b[:, 3] >= b[:, 1])


def test_random_augment_bbox_affine_mode():
    np.random.seed(2)
    r = _results(64, 64, boxes=[[10, 10, 40, 40]])
    out = RandomAugmentBBox(aug_type="affine")(r)
    assert out["img"].shape == (64, 64, 3)
    assert out["gt_bboxes"].shape[1] == 4
    assert len(out["gt_bboxes"]) == len(out["gt_labels"])


def test_ubaug_shape_and_dtype():
    np.random.seed(3)
    r = _results(64, 64)
    r["img"] = r["img"].astype(np.uint8)
    out = UBAug()(r)
    assert out["img"].shape == (64, 64, 3)


def test_format_sample_and_batch():
    r = _results(100, 200, boxes=[[10, 10, 50, 50]])
    r["scale_factor"] = np.ones(4, np.float32)
    s = format_sample(r, canvas_hw=(128, 256), max_gt=5, max_ignore=3)
    assert s["images"].shape == (128, 256, 3)
    assert s["gt_bboxes"].shape == (5, 4)
    assert s["gt_valid"].tolist() == [True, False, False, False, False]
    batch = build_batch([s, s], source_weights=[1.0, 3.0])
    assert batch["images"].shape == (2, 128, 256, 3)
    assert batch["source_weight"].tolist() == [1.0, 3.0]


def test_scale_invariant_batch():
    r = _results(100, 200, boxes=[[10, 10, 50, 50]])
    r["scale_factor"] = np.ones(4, np.float32)
    s = format_sample(r, canvas_hw=(128, 256), max_gt=5, max_ignore=3)
    batch = build_batch([s, s], source_weights=[1.0, 3.0],
                        scale_invariant=True)
    assert batch["images"].shape == (3, 128, 256, 3)
    assert int(batch["si_pair"]["full"]) == 1
    assert int(batch["si_pair"]["half"]) == 2
    # half-res copy: gt halved, weight copied from source image
    np.testing.assert_allclose(batch["gt_bboxes"][2][0], [5, 5, 25, 25])
    assert batch["source_weight"].tolist() == [1.0, 3.0, 3.0]
    # pixel content shrunk into top-left corner
    assert np.any(batch["images"][2][:50, :100] != 0)
    assert np.all(batch["images"][2][64:, :] == 0)
