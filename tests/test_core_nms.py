import numpy as np
import jax.numpy as jnp

from dsl_tpu.core.nms import nms, batched_nms, multiclass_nms, soft_nms


def _ref_greedy_nms(boxes, scores, thr):
    """Sequential greedy reference in numpy."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        iou = inter / np.maximum(ai + a - inter, 1e-6)
        suppressed |= iou > thr
        suppressed[i] = False  # don't self-suppress the kept box
    return keep


def test_nms_matches_sequential_greedy(rng):
    for trial in range(5):
        n = 64
        centers = rng.rand(n, 2) * 100
        wh = rng.rand(n, 2) * 30 + 5
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
        scores = rng.rand(n).astype(np.float32)
        ref_keep = _ref_greedy_nms(boxes, scores, 0.5)
        dets, idx, valid = nms(jnp.asarray(boxes, jnp.float32),
                               jnp.asarray(scores), 0.5, max_out=n)
        got = list(np.asarray(idx)[np.asarray(valid)])
        assert got == ref_keep, f"trial {trial}: {got} vs {ref_keep}"


def test_nms_respects_valid_mask():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.array([False, True, True])
    dets, idx, out_valid = nms(boxes, scores, 0.5, max_out=3, valid=valid)
    kept = list(np.asarray(idx)[np.asarray(out_valid)])
    assert kept == [1, 2]


def test_nms_padding_rows():
    boxes = jnp.array([[0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.5])
    dets, idx, valid = nms(boxes, scores, 0.5, max_out=4)
    assert np.asarray(valid).tolist() == [True, False, False, False]
    assert float(dets[0, 4]) == 0.5


def test_batched_nms_separates_classes():
    # identical overlapping boxes but different labels: both survive
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    labels = jnp.array([0, 1], jnp.int32)
    dets, idx, valid, out_labels = batched_nms(boxes, scores, labels, 0.5, 4)
    assert int(np.asarray(valid).sum()) == 2
    # same labels: one suppressed
    labels2 = jnp.array([0, 0], jnp.int32)
    _, _, valid2, _ = batched_nms(boxes, scores, labels2, 0.5, 4)
    assert int(np.asarray(valid2).sum()) == 1


def test_multiclass_nms():
    # 3 points, 2 classes
    boxes = jnp.array([[0, 0, 10, 10], [0.5, 0.5, 10, 10], [50, 50, 60, 60]],
                      jnp.float32)
    scores = jnp.array([[0.9, 0.01], [0.85, 0.6], [0.02, 0.7]], jnp.float32)
    dets, labels, valid = multiclass_nms(boxes, scores, score_thr=0.05,
                                         iou_threshold=0.5, max_per_img=10,
                                         pre_nms_top=6)
    v = np.asarray(valid)
    d = np.asarray(dets)[v]
    l = np.asarray(labels)[v]
    # expected survivors: point0 cls0 (0.9), point1 cls1 (0.6), point2 cls1 (0.7)
    assert len(d) == 3
    got = sorted((int(a), round(float(b), 2)) for a, b in zip(l, d[:, 4]))
    assert got == [(0, 0.9), (1, 0.6), (1, 0.7)]
    # scores sorted descending among survivors
    assert list(d[:, 4]) == sorted(d[:, 4], reverse=True)


def test_soft_nms_decays_not_removes():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    dets, idx, valid = soft_nms(boxes, scores, iou_threshold=0.3,
                                method="linear", score_thr=1e-3, max_out=3)
    v = np.asarray(valid)
    assert v.sum() == 3  # overlapping box decayed but kept
    d = np.asarray(dets)
    # decayed score of box1 = 0.8 * (1 - iou(0,1))
    from dsl_tpu.core.boxes import bbox_overlaps
    iou01 = float(bbox_overlaps(boxes[:1], boxes[1:2], is_aligned=True)[0])
    order = np.asarray(idx)
    pos1 = list(order).index(1)
    assert abs(d[pos1, 4] - 0.8 * (1 - iou01)) < 1e-5
