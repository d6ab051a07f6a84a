import numpy as np
import jax.numpy as jnp

from dsl_tpu.core.boxes import (
    bbox_overlaps, bbox2distance, distance2bbox, bbox2delta, delta2bbox,
    bbox_area, clip_boxes, bbox_flip,
)


def test_iou_basic():
    # golden values mirrored from mmdet's iou_calculator doctest
    b1 = jnp.array([[0, 0, 10, 10], [10, 10, 20, 20], [32, 32, 38, 42]],
                   jnp.float32)
    b2 = jnp.array([[0, 0, 10, 20], [0, 10, 10, 19], [10, 10, 20, 20]],
                   jnp.float32)
    ious = np.asarray(bbox_overlaps(b1, b2))
    expect = np.array([
        [0.5, 0.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, 0.0],
    ], np.float32)
    np.testing.assert_allclose(ious, expect, atol=1e-5)


def test_iou_aligned_and_iof():
    b1 = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b2 = jnp.array([[5, 5, 15, 15]], jnp.float32)
    iou = float(bbox_overlaps(b1, b2, is_aligned=True)[0])
    assert abs(iou - 25.0 / 175.0) < 1e-6
    iof = float(bbox_overlaps(b1, b2, mode="iof", is_aligned=True)[0])
    assert abs(iof - 0.25) < 1e-6


def test_giou_enclosing_penalty():
    b1 = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b2 = jnp.array([[20, 0, 30, 10]], jnp.float32)  # disjoint, same row
    giou = float(bbox_overlaps(b1, b2, mode="giou", is_aligned=True)[0])
    # iou=0, enclosure 30x10=300, union=200 -> giou = -(300-200)/300
    assert abs(giou + 100.0 / 300.0) < 1e-5


def test_distance_bbox_roundtrip():
    pts = jnp.array([[50.0, 60.0], [10.0, 10.0]])
    boxes = jnp.array([[40, 40, 70, 90], [0, 0, 20, 15]], jnp.float32)
    d = bbox2distance(pts, boxes)
    back = distance2bbox(pts, d)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-5)


def test_delta_roundtrip():
    rois = jnp.array([[0., 0., 10., 10.], [5., 5., 25., 15.]])
    gt = jnp.array([[1., 2., 12., 9.], [6., 4., 27., 18.]])
    deltas = bbox2delta(rois, gt)
    back = delta2bbox(rois, deltas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)


def test_area_and_clip_and_flip():
    b = jnp.array([[-5., -5., 15., 8.]])
    assert float(bbox_area(b)[0]) == 20 * 13
    c = clip_boxes(b, (10, 12))
    np.testing.assert_allclose(np.asarray(c), [[0, 0, 12, 8]])
    f = bbox_flip(jnp.array([[2., 3., 6., 9.]]), (20, 10))
    np.testing.assert_allclose(np.asarray(f), [[4, 3, 8, 9]])
