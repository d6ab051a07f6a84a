import json

import numpy as np
import pytest

from dsl_tpu.train.label_store import (
    LabelStore, compute_adathres, numpy_nms)


@pytest.fixture
def store(tmp_path):
    id2cat = {"0": "cat", "1": "dog", "2": "bg"}
    cat2id = {"cat": 0, "dog": 1, "bg": 2}
    return LabelStore(str(tmp_path / "annos"), id2cat, cat2id)


def test_numpy_nms_greedy():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    keep = numpy_nms(boxes, scores, 0.5)
    assert keep.tolist() == [0, 2]
    keep2 = numpy_nms(boxes, scores, 0.5, score_threshold=0.75)
    assert keep2.tolist() == [0]


def test_store_update_thresholds_and_per_class_nms(store):
    boxes = np.asarray([
        [0, 0, 10, 10],      # cat 0.9 keep
        [1, 1, 11, 11],      # cat 0.8 suppressed by NMS
        [0, 0, 10, 10],      # dog 0.7 keep (different class)
        [50, 50, 60, 60],    # cat 0.05 below thre -> dropped
    ], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7, 0.05], np.float32)
    cids = np.asarray([0, 0, 1, 0], np.int64)
    store.update("a.jpg", boxes, scores, cids, infer_score_thre=0.1, iou=0.5)
    data = store.read("a.jpg")
    assert data["targetNum"] == 2
    assert sorted(data["tags"]) == ["cat", "dog"]
    assert all(s >= 0.1 for s in data["scores"])


def test_store_fuse_history(store):
    store.write("a.jpg", [[0, 0, 10, 10]], ["cat"], [0.6])
    # new detection overlapping the old one with higher score
    store.update("a.jpg", np.asarray([[1, 1, 11, 11]], np.float32),
                 np.asarray([0.9], np.float32), np.asarray([0]),
                 infer_score_thre=0.1, iou=0.5, fuse=True)
    data = store.read("a.jpg")
    assert data["targetNum"] == 1
    assert abs(data["scores"][0] - 0.9) < 1e-6   # new higher score wins NMS
    # without fuse, old disjoint boxes are dropped entirely
    store.write("b.jpg", [[100, 100, 120, 120]], ["dog"], [0.99])
    store.update("b.jpg", np.asarray([[0, 0, 10, 10]], np.float32),
                 np.asarray([0.5], np.float32), np.asarray([0]),
                 infer_score_thre=0.1, iou=0.5, fuse=False)
    data = store.read("b.jpg")
    assert data["targetNum"] == 1
    assert data["tags"] == ["cat"]


def test_adathres_formula(store, tmp_path):
    # class 'cat': two boxes scores .9/.8 (cum 1.7); 'dog': one box .4
    store.write("a.jpg", [[0, 0, 10, 10], [20, 20, 30, 30]],
                ["cat", "cat"], [0.9, 0.8])
    store.write("b.jpg", [[0, 0, 10, 10]], ["dog"], [0.4])
    out = str(tmp_path / "adathres.json")
    res = compute_adathres(store, ["a.jpg", "b.jpg"], out,
                           ranges=(0.3, 0.35), gamma1=0.05, gamma2=0.6,
                           base=0.3)
    # avg = 3 boxes / 2 classes = 1.5
    # cat thres = clip(0.3 * (1.7/1.5)^0.05, .3, .35)
    expect_cat = min(max(0.3 * (1.7 / 1.5) ** 0.05, 0.3), 0.35)
    assert abs(res["thres"]["cat"] - expect_cat) < 1e-9
    # dog: cum .4 -> (0.4/1.5)^0.05*0.3 < 0.3 -> clipped to 0.3
    assert res["thres"]["dog"] == 0.3
    # weights = (avg/cum)^0.6
    assert abs(res["cat"]["cat"] - (1.5 / 1.7) ** 0.6) < 1e-9
    assert abs(res["cat"]["dog"] - (1.5 / 0.4) ** 0.6) < 1e-9
    with open(out) as f:
        on_disk = json.load(f)
    assert on_disk["thres"] == res["thres"]


def test_adathres_history_filters_low_scores(store, tmp_path):
    out = str(tmp_path / "adathres.json")
    with open(out, "w") as f:
        json.dump(dict(thres={"cat": 0.85, "dog": 0.3}), f)
    store.write("a.jpg", [[0, 0, 10, 10], [20, 20, 30, 30]],
                ["cat", "cat"], [0.9, 0.5])     # only .9 passes history .85
    store.write("b.jpg", [[0, 0, 10, 10]], ["dog"], [0.4])
    res = compute_adathres(store, ["a.jpg", "b.jpg"], out)
    # cat counted once (cum .9), dog once (cum .4); avg = 1.0
    assert abs(res["cat"]["cat"] - (1.0 / 0.9) ** 0.6) < 1e-9
