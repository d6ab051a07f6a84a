import numpy as np

from dsl_tpu.data.coco_api import COCO
from dsl_tpu.core.eval.coco_eval import COCOEval


def _make_gt(anns, imgs=None, cats=(1, 2)):
    imgs = imgs or [dict(id=1, width=640, height=480, file_name="a.jpg"),
                    dict(id=2, width=640, height=480, file_name="b.jpg")]
    dataset = dict(
        images=imgs,
        categories=[dict(id=c, name=f"c{c}") for c in cats],
        annotations=[
            dict(id=i + 1, **a) for i, a in enumerate(anns)
        ])
    return COCO(dataset=dataset)


def _det(img, cat, box, score):
    return dict(image_id=img, category_id=cat, bbox=list(box), score=score)


def test_perfect_detections_map_1():
    gt = _make_gt([
        dict(image_id=1, category_id=1, bbox=[10, 10, 50, 50], area=2500),
        dict(image_id=2, category_id=2, bbox=[20, 20, 40, 80], area=3200),
    ])
    dts = [_det(1, 1, [10, 10, 50, 50], 0.9),
           _det(2, 2, [20, 20, 40, 80], 0.8)]
    stats = COCOEval(gt, dts).evaluate()
    assert abs(stats["mAP"] - 1.0) < 1e-6
    assert abs(stats["mAP_50"] - 1.0) < 1e-6


def test_no_detections_map_0():
    gt = _make_gt([dict(image_id=1, category_id=1, bbox=[10, 10, 50, 50],
                        area=2500)])
    stats = COCOEval(gt, []).evaluate()
    assert stats["mAP"] == 0.0


def test_half_recall():
    gt = _make_gt([
        dict(image_id=1, category_id=1, bbox=[10, 10, 50, 50], area=2500),
        dict(image_id=2, category_id=1, bbox=[20, 20, 40, 80], area=3200),
    ])
    dts = [_det(1, 1, [10, 10, 50, 50], 0.9)]  # only one of two found
    stats = COCOEval(gt, dts).evaluate()
    # precision 1 up to recall 0.5 -> 101-pt AP ≈ 51/101
    assert abs(stats["mAP_50"] - 51.0 / 101.0) < 1e-6


def test_false_positive_lowers_precision():
    gt = _make_gt([dict(image_id=1, category_id=1, bbox=[10, 10, 50, 50],
                        area=2500)])
    dts = [_det(1, 1, [10, 10, 50, 50], 0.9),
           _det(1, 1, [200, 200, 50, 50], 0.95)]  # high-score FP first
    stats = COCOEval(gt, dts).evaluate()
    # best precision at recall>0 is 0.5 (FP ranked above TP)
    assert abs(stats["mAP_50"] - 0.5) < 1e-6


def test_localization_quality_spread():
    # det with IoU ~0.6: counts at low thresholds, not at high
    gt = _make_gt([dict(image_id=1, category_id=1, bbox=[0, 0, 100, 100],
                        area=10000)])
    dts = [_det(1, 1, [0, 0, 100, 75], 0.9)]  # IoU = 0.75
    stats = COCOEval(gt, dts).evaluate()
    assert stats["mAP_50"] == 1.0
    assert stats["mAP_75"] == 1.0
    assert 0 < stats["mAP"] < 1.0  # fails above IoU 0.75


def test_crowd_gt_is_ignore():
    gt = _make_gt([
        dict(image_id=1, category_id=1, bbox=[10, 10, 50, 50], area=2500),
        dict(image_id=1, category_id=1, bbox=[100, 100, 200, 200],
             area=40000, iscrowd=1),
    ])
    # detection inside crowd region: matched to crowd -> ignored, not FP
    dts = [_det(1, 1, [10, 10, 50, 50], 0.9),
           _det(1, 1, [120, 120, 100, 100], 0.8)]
    stats = COCOEval(gt, dts).evaluate()
    assert abs(stats["mAP_50"] - 1.0) < 1e-6


def test_wrong_class_no_credit():
    gt = _make_gt([dict(image_id=1, category_id=1, bbox=[10, 10, 50, 50],
                        area=2500)])
    dts = [_det(1, 2, [10, 10, 50, 50], 0.9)]
    stats = COCOEval(gt, dts).evaluate()
    assert stats["mAP"] == 0.0


def test_area_split():
    gt = _make_gt([
        dict(image_id=1, category_id=1, bbox=[0, 0, 20, 20], area=400),     # small
        dict(image_id=1, category_id=1, bbox=[100, 100, 200, 200],
             area=40000),                                                   # large
    ])
    dts = [_det(1, 1, [0, 0, 20, 20], 0.9)]  # only the small one found
    stats = COCOEval(gt, dts).evaluate()
    assert stats["mAP_s"] == 1.0
    assert stats["mAP_l"] == 0.0


def test_get_classes_registry():
    from dsl_tpu.core.eval.class_names import get_classes

    assert len(get_classes("coco")) == 80
    assert len(get_classes("voc")) == 20
    assert len(get_classes("cityscapes")) == 8
    assert get_classes("wider_face") == ["face"]
    assert len(get_classes("DeepFashion")) == 15
    import pytest as _pytest

    with _pytest.raises(ValueError):
        get_classes("imagenet")
