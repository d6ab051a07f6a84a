import numpy as np
import pytest

from dsl_tpu.data.pipelines.extra_transforms import (
    AutoAugment, CutOut, Expand, MinIoURandomCrop, PhotoMetricDistortion,
    RandomCrop, RandomShift)
from dsl_tpu.data.datasets.wrappers import (
    ClassBalancedDataset, ConcatDataset, RepeatDataset)


def _results(h=100, w=120, boxes=((10, 10, 50, 50),)):
    r = dict(img=np.random.RandomState(0).randint(
        0, 255, (h, w, 3), np.uint8))
    r["img_shape"] = r["img"].shape
    r["gt_bboxes"] = np.asarray(boxes, np.float32)
    r["gt_labels"] = np.arange(len(boxes), dtype=np.int64)
    r["gt_bboxes_ignore"] = np.zeros((0, 4), np.float32)
    r["bbox_fields"] = ["gt_bboxes", "gt_bboxes_ignore"]
    return r


def test_random_crop():
    np.random.seed(0)
    out = RandomCrop((64, 64))(_results())
    assert out["img"].shape[:2] == (64, 64)
    if len(out["gt_bboxes"]):
        assert out["gt_bboxes"][:, 2].max() <= 64


def test_random_crop_negative_returns_none():
    np.random.seed(0)
    # crop that cannot contain the tiny corner box every time is hard to
    # force; instead verify allow_negative_crop path keeps empty gt
    r = _results(boxes=((0, 0, 2, 2),))
    out = RandomCrop((10, 10), allow_negative_crop=True)(r)
    assert out is not None


def test_min_iou_random_crop():
    np.random.seed(1)
    out = MinIoURandomCrop()(_results())
    assert out["img"].ndim == 3
    assert len(out["gt_bboxes"]) == len(out["gt_labels"])


def test_expand_shifts_boxes():
    np.random.seed(2)
    out = Expand(prob=1.0, ratio_range=(2, 2))(_results())
    assert out["img"].shape[0] == 200
    b = out["gt_bboxes"][0]
    assert b[2] - b[0] == 40  # box size preserved


def test_photometric_distortion():
    np.random.seed(3)
    out = PhotoMetricDistortion()(_results())
    assert out["img"].shape == (100, 120, 3)


def test_cutout():
    np.random.seed(4)
    out = CutOut(n_holes=2, cutout_shape=[(10, 10)])(_results())
    assert out["img"].shape == (100, 120, 3)


def test_random_shift():
    np.random.seed(5)
    out = RandomShift(shift_ratio=1.0, max_shift_px=8)(_results())
    assert out["img"].shape == (100, 120, 3)
    assert len(out["gt_bboxes"]) == len(out["gt_labels"])


def test_autoaugment_picks_policy():
    np.random.seed(6)
    aa = AutoAugment([[dict(type="RandomShift", shift_ratio=1.0,
                            max_shift_px=4)],
                      [dict(type="CutOut", n_holes=1,
                            cutout_shape=[(5, 5)])]])
    out = aa(_results())
    assert out["img"].shape == (100, 120, 3)


class _FakeDs:
    def __init__(self, n, label):
        self.n = n
        self.label = label
        self.flag = np.zeros(n, np.uint8)
        self.CLASSES = ("a", "b")

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (self.label, i)

    def get_ann_info(self, i):
        return dict(labels=np.asarray([self.label]),
                    bboxes=np.zeros((1, 4)))


def test_concat_and_repeat():
    c = ConcatDataset([_FakeDs(3, 0), _FakeDs(2, 1)])
    assert len(c) == 5
    assert c[0] == (0, 0) and c[3] == (1, 0)
    r = RepeatDataset(_FakeDs(3, 0), times=3)
    assert len(r) == 9
    assert r[5] == (0, 2)


def test_class_balanced_oversamples_rare():
    # class 1 appears in 1/10 of images; thr 0.5 -> repeat sqrt(0.5/0.1)≈2.2
    class Mixed(_FakeDs):
        def get_ann_info(self, i):
            return dict(labels=np.asarray([1 if i == 0 else 0]),
                        bboxes=np.zeros((1, 4)))

    ds = Mixed(10, 0)
    cb = ClassBalancedDataset(ds, oversample_thr=0.5)
    assert len(cb) > len(ds)
    # image 0 (rare class) repeated more than the common ones
    assert cb.indices.count(0) >= cb.indices.count(1)


def test_reference_pipeline_surface_fillins():
    """LoadProposals / FilterAnnotations / ToTensor / Transpose /
    ToDataContainer / WrapFieldsToLists resolve by reference config names
    and follow reference semantics."""
    import numpy as np

    from dsl_tpu.data.pipelines.compose import Compose

    props = np.asarray([[1, 2, 3, 4, 0.9], [5, 6, 7, 8, 0.1]], np.float32)
    p = Compose([dict(type="LoadProposals", num_max_proposals=1)])
    out = p(dict(proposals=props))
    assert out["proposals"].shape == (1, 4)
    assert "proposals" in out["bbox_fields"]

    f = Compose([dict(type="FilterAnnotations", min_gt_bbox_wh=(4, 4))])
    res = f(dict(gt_bboxes=np.asarray([[0, 0, 2, 2], [0, 0, 10, 10]],
                                      np.float32),
                 gt_labels=np.asarray([1, 2])))
    assert len(res["gt_bboxes"]) == 1 and res["gt_labels"].tolist() == [2]
    assert f(dict(gt_bboxes=np.asarray([[0., 0., 1., 1.]], np.float32),
                  gt_labels=np.asarray([1]))) is None

    t = Compose([dict(type="ToTensor", keys=["img"]),
                 dict(type="Transpose", keys=["img"], order=(2, 0, 1)),
                 dict(type="ToDataContainer")])
    out = t(dict(img=np.zeros((4, 6, 3), np.float32)))
    assert out["img"].shape == (3, 4, 6)

    w = Compose([dict(type="WrapFieldsToLists")])
    out = w(dict(a=1, b="x"))
    assert out == dict(a=[1], b=["x"])
