"""Golden tests for the coder/assigner fill-ins (GridAssigner,
YOLOBBoxCoder, LegacyDeltaXYWHBBoxCoder, PseudoBBoxCoder)."""

import numpy as np
import jax.numpy as jnp


def test_legacy_delta2bbox_reference_example():
    """Pinned to the reference's own docstring example
    (``legacy_delta_xywh_bbox_coder.py:162-175``)."""
    from dsl_tpu.core.boxes import legacy_bbox2delta, legacy_delta2bbox

    rois = jnp.asarray([[0., 0., 1., 1.], [0., 0., 1., 1.],
                        [0., 0., 1., 1.], [5., 5., 5., 5.]])
    deltas = jnp.asarray([[0., 0., 0., 0.], [1., 1., 1., 1.],
                          [0., 0., 2., -1.], [0.7, -1.9, -0.5, 0.3]])
    out = np.asarray(legacy_delta2bbox(rois, deltas, max_shape=(32, 32)))
    exp = np.array([[0., 0., 1.5, 1.5],
                    [0., 0., 5.2183, 5.2183],
                    [0., 0.1321, 7.8891, 0.8679],
                    [5.3967, 2.4251, 6.0033, 3.7749]])
    np.testing.assert_allclose(out, exp, atol=2e-3)

    # encode/decode roundtrip (away from clipping)
    props = jnp.asarray([[5., 6., 25., 30.]])
    gts = jnp.asarray([[8., 8., 22., 26.]])
    enc = legacy_bbox2delta(props, gts)
    dec = legacy_delta2bbox(props, enc)
    # the dropped ±0.5 corner shift makes the roundtrip off by exactly
    # 0.5 px on each side (reference comment :202-204)
    np.testing.assert_allclose(np.asarray(dec),
                               np.asarray(gts) + [-.5, -.5, .5, .5],
                               atol=1e-4)


def test_yolo_coder_roundtrip_and_clamp():
    from dsl_tpu.core.boxes import yolo_decode, yolo_encode

    b = jnp.asarray([[10., 10., 30., 40.], [0., 0., 16., 16.]])
    g = jnp.asarray([[12., 14., 28., 38.], [2., 2., 10., 12.]])
    enc = yolo_encode(b, g, 8.0)
    assert np.all(np.asarray(enc[:, :2]) > 0)
    assert np.all(np.asarray(enc[:, :2]) < 1)
    dec = yolo_decode(b, enc, 8.0)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(g), atol=1e-4)


def test_pseudo_coder_identity():
    from dsl_tpu.core.boxes import pseudo_decode, pseudo_encode

    b = jnp.asarray([[1., 2., 3., 4.]])
    g = jnp.asarray([[5., 6., 7., 8.]])
    assert np.all(np.asarray(pseudo_encode(b, g)) == np.asarray(g))
    assert np.all(np.asarray(pseudo_decode(b, g)) == np.asarray(g))


def test_grid_assign_responsible_constraint():
    from dsl_tpu.core.assigners import grid_assign

    # two candidate boxes, both overlap the gt equally; only box 0 is
    # responsible -> only box 0 may become positive
    boxes = jnp.asarray([[0., 0., 10., 10.], [0., 0., 10., 10.]])
    gt = jnp.asarray([[[1., 1., 9., 9.]]])
    gtl = jnp.asarray([[2]], jnp.int32)
    gtv = jnp.ones((1, 1), bool)
    resp = jnp.asarray([True, False])
    labels, assigned, weights, max_iou = grid_assign(
        boxes, resp, gt, gtl, gtv, pos_iou_thr=0.3, neg_iou_thr=0.3,
        num_classes=4)
    assert int(labels[0, 0]) == 2 and int(assigned[0, 0]) == 0
    assert int(labels[0, 1]) == 4 and int(assigned[0, 1]) == -1

    # gt forces its best responsible box positive even below pos_iou_thr
    labels2, assigned2, _, _ = grid_assign(
        boxes, resp, gt, gtl, gtv, pos_iou_thr=0.99, neg_iou_thr=0.99,
        min_pos_iou=0.1, num_classes=4)
    assert int(labels2[0, 0]) == 2
    assert int(labels2[0, 1]) == 4


def test_yolo_decode_mmdet_golden():
    """Pinned to the reference's own unit test
    (``tests/test_utils/test_coder.py:8-24``)."""
    from dsl_tpu.core.boxes import yolo_decode

    bboxes = jnp.asarray([[-42., -29., 74., 61.], [-10., -29., 106., 61.],
                          [22., -29., 138., 61.], [54., -29., 170., 61.]])
    pred = jnp.asarray([[0.4709, 0.6152, 0.1690, -0.4056],
                        [0.5399, 0.6653, 0.1162, -0.4162],
                        [0.4654, 0.6618, 0.1548, -0.4301],
                        [0.4786, 0.6197, 0.1896, -0.4479]])
    expected = np.asarray([[-53.6102, -10.3096, 83.7478, 49.6824],
                           [-15.8700, -8.3901, 114.4236, 50.9693],
                           [11.1822, -8.0924, 146.6034, 50.4476],
                           [41.2068, -8.9232, 181.4236, 48.5840]])
    out = np.asarray(yolo_decode(bboxes, pred, 32.0))
    np.testing.assert_allclose(out, expected, atol=1e-3)
