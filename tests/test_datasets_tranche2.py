"""LVIS federated eval, Cityscapes filtering, pipeline fill-ins."""

import json

import numpy as np
import pytest

from dsl_tpu.data.datasets.lvis import CityscapesDataset, LVISDataset


def _lvis_json(tmp_path):
    data = dict(
        images=[
            dict(id=1, file_name="a.jpg", width=64, height=64,
                 neg_category_ids=[2], not_exhaustive_category_ids=[]),
            dict(id=2, file_name="b.jpg", width=64, height=64,
                 neg_category_ids=[], not_exhaustive_category_ids=[]),
        ],
        categories=[dict(id=1, name="common", frequency="c"),
                    dict(id=2, name="rare", frequency="r")],
        annotations=[dict(id=1, image_id=1, category_id=1,
                          bbox=[8, 8, 16, 16], area=256, iscrowd=0)])
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_lvis_federated_eval(tmp_path):
    ds = LVISDataset(ann_file=_lvis_json(tmp_path), pipeline=[],
                     test_mode=True)
    assert ds.CLASSES == ("common", "rare")
    perfect = np.asarray([[8.0, 8.0, 24.0, 24.0, 0.9]])
    # image 2 predictions for class 'rare' must NOT count as FPs (class 2
    # is neither annotated nor negative there -> excluded pair)
    fp_rare_img2 = (np.asarray([[0.0, 0.0, 10.0, 10.0, 0.95]]),
                    np.asarray([1]))
    results = [(perfect, np.asarray([0])), fp_rare_img2]
    m = ds.evaluate(results, verbose=False)
    assert m["bbox_mAP"] > 0.99          # the FP was federated away
    assert m["bbox_mAP_c"] > 0.99        # frequency buckets reported
    assert m["bbox_mAP_r"] == -1.0       # no rare GT anywhere

    # the same wrong det on image 1 (class 2 in neg_category_ids) DOES count
    results2 = [(np.concatenate([perfect,
                                 [[0.0, 0.0, 10.0, 10.0, 0.95]]]),
                 np.asarray([0, 1])),
                (np.zeros((0, 5)), np.zeros((0,), np.int64))]
    m2 = ds.evaluate(results2, verbose=False)
    assert m2["bbox_mAP"] > 0.99         # class 1 still perfect; class 2 has
    #   no GT at all so its FP doesn't enter AP (no npig) — but the pair was
    #   evaluated, unlike the federated exclusion above


def test_cityscapes_filters_by_category(tmp_path):
    data = dict(
        images=[dict(id=1, file_name="a.jpg", width=64, height=64),
                dict(id=2, file_name="b.jpg", width=64, height=64)],
        categories=[dict(id=1, name="person"), dict(id=2, name="sky")],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[1, 1, 10, 10],
                 area=100, iscrowd=0),
            dict(id=2, image_id=2, category_id=2, bbox=[1, 1, 10, 10],
                 area=100, iscrowd=0)])
    p = tmp_path / "cs.json"
    p.write_text(json.dumps(data))
    ds = CityscapesDataset(ann_file=str(p), pipeline=[],
                           classes=("person",))
    # image 2 only has a non-required category -> filtered
    assert len(ds) == 1


def test_corrupt_and_albu_shapes():
    from dsl_tpu.data.pipelines.fillin_transforms import Albu, Corrupt

    img = np.random.RandomState(0).randint(0, 255, (32, 40, 3), np.uint8)
    # full reference benchmark protocol (test_robustness.py:104-110) = 15
    # corruptions, + the 4 holdout ones
    assert len(Corrupt.BENCHMARK) == 15
    assert set(Corrupt.BENCHMARK).isdisjoint(Corrupt.HOLDOUT)
    for c in Corrupt.SUPPORTED:
        out = Corrupt(c, severity=3)({"img": img.copy()})
        assert out["img"].shape == img.shape
        # severity 3 must corrupt materially (sanity: not a no-op)
        diff = np.abs(out["img"].astype(np.float32)
                      - img.astype(np.float32)).mean()
        assert diff > 1.0, f"{c} severity-3 changed image by only {diff}"
    aug = Albu([dict(type="RandomBrightnessContrast", p=1.0),
                dict(type="HueSaturationValue", p=1.0),
                dict(type="OneOf", p=1.0, transforms=[
                    dict(type="Blur"), dict(type="MedianBlur")])])
    out = aug({"img": img.copy()})
    assert out["img"].shape == img.shape
    with pytest.raises(ValueError):
        Albu([dict(type="ElasticTransform")])


def test_instaboost_moves_instance():
    from dsl_tpu.core.masks import BitmapMasks
    from dsl_tpu.data.pipelines.fillin_transforms import InstaBoost

    img = np.zeros((64, 64, 3), np.uint8)
    img[20:30, 20:30] = 200
    mask = np.zeros((64, 64), np.uint8)
    mask[20:30, 20:30] = 1
    np.random.seed(3)
    results = dict(img=img, gt_bboxes=np.asarray([[20., 20., 30., 30.]]),
                   gt_labels=np.asarray([0]),
                   gt_masks=BitmapMasks([mask], 64, 64))
    out = InstaBoost(aug_ratio=1.0)(results)
    b = out["gt_bboxes"][0]
    m = out["gt_masks"].masks[0]
    # box and mask stay consistent wherever the instance landed
    ys, xs = np.nonzero(m)
    assert abs(ys.min() - b[1]) <= 1 and abs(xs.min() - b[0]) <= 1
    # pixels moved with the mask
    assert out["img"][ys[0], xs[0], 0] == 200


def test_random_center_crop_pad_train_and_test():
    from dsl_tpu.data.pipelines.fillin_transforms import RandomCenterCropPad

    img = np.random.RandomState(0).randint(0, 255, (100, 120, 3), np.uint8)
    boxes = np.asarray([[40.0, 40.0, 70.0, 70.0]], np.float32)
    np.random.seed(0)
    t = RandomCenterCropPad(crop_size=(96, 96), ratios=(1.0,), border=16,
                            mean=(10, 10, 10))
    out = t(dict(img=img.copy(), gt_bboxes=boxes.copy(),
                 gt_labels=np.asarray([0]), bbox_fields=["gt_bboxes"]))
    assert out["img"].shape == (96, 96, 3)
    assert len(out["gt_bboxes"]) == 1            # the gt center survived
    b = out["gt_bboxes"][0]
    assert (b[2] - b[0]) <= 30 + 1e-5

    te = RandomCenterCropPad(test_mode=True, test_pad_mode=("logical_or", 31),
                             mean=(0, 0, 0))
    out2 = te(dict(img=img.copy()))
    assert out2["img"].shape[0] == (100 | 31) and \
        out2["img"].shape[1] == (120 | 31)
    assert "border" in out2
