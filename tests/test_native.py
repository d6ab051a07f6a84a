"""Native C++ ops: build, bind, and match the numpy references exactly."""

import numpy as np
import pytest

from dsl_tpu.native import (
    get_lib, native_batched_nms, native_iou_matrix, native_nms,
    native_normalize_pad)


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable (no g++)")


def _np_greedy(boxes, scores, thr, score_thr=0.0):
    order = np.argsort(-scores, kind="mergesort")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i] or scores[i] < score_thr:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-10)
        suppressed |= iou > thr
        suppressed[i] = False
    return keep


def test_native_nms_matches_numpy(rng):
    for _ in range(5):
        n = 200
        c = rng.rand(n, 2) * 100
        wh = rng.rand(n, 2) * 30 + 5
        boxes = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        got = native_nms(boxes, scores, 0.5).tolist()
        assert got == _np_greedy(boxes, scores, 0.5)


def test_native_batched_nms(rng):
    n = 100
    c = rng.rand(n, 2) * 50
    wh = rng.rand(n, 2) * 20 + 5
    boxes = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    cids = rng.randint(0, 3, n).astype(np.int32)
    got = set(native_batched_nms(boxes, scores, cids, 3, 0.5).tolist())
    expect = set()
    for cl in range(3):
        idx = np.where(cids == cl)[0]
        for k in _np_greedy(boxes[idx], scores[idx], 0.5):
            expect.add(int(idx[k]))
    assert got == expect


def test_native_normalize_pad(rng):
    img = rng.randint(0, 255, (50, 60, 3), np.uint8)
    mean = np.asarray([10.0, 20.0, 30.0], np.float32)
    std = np.asarray([2.0, 3.0, 4.0], np.float32)
    out = native_normalize_pad(img, mean, std, True, (64, 80))
    assert out.shape == (64, 80, 3)
    expect = (img[..., ::-1].astype(np.float32) - mean) / std
    np.testing.assert_allclose(out[:50, :60], expect, atol=1e-5)
    assert np.all(out[50:] == 0) and np.all(out[:, 60:] == 0)


def test_native_iou_matrix(rng):
    a = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    b = np.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
    out = native_iou_matrix(a, b)
    np.testing.assert_allclose(out[0], [1.0, 0.0], atol=1e-6)
    assert abs(out[1, 0] - 25.0 / 175.0) < 1e-6
