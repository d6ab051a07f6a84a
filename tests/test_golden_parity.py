"""Golden-parity pack: expected values ported from the reference's own unit
tests, pinning this implementation's math to mmdet's numbers.

Sources (values only — code is original):
- ``/root/reference/tests/test_utils/test_coder.py`` (DeltaXYWH decode)
- ``/root/reference/tests/test_utils/test_anchor.py`` (AnchorGenerator /
  MlvlPointGenerator expected anchors, square + non-square strides)
- ``/root/reference/tests/test_metrics/test_losses.py`` (CE golden)
- ``/root/reference/tests/test_models/test_dense_heads/test_fcos_head.py``
  (empty-vs-one-GT loss behavior at the reference's exact GT box)
- COCOeval golden: a small scenario whose 101-point-interpolated AP is
  derived by hand (worked in comments), catching any protocol drift in
  ``core/eval/coco_eval.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.core import losses as L
from dsl_tpu.core.anchors import AnchorGenerator
from dsl_tpu.core.boxes import bbox_overlaps, delta2bbox
from dsl_tpu.core.points import MlvlPointGenerator


# -- DeltaXYWHBBoxCoder (test_coder.py:26-49) -------------------------------


def test_delta2bbox_matches_mmdet_golden():
    rois = jnp.asarray([[0., 0., 1., 1.], [0., 0., 1., 1.],
                        [0., 0., 1., 1.], [5., 5., 5., 5.]])
    deltas = jnp.asarray([[0., 0., 0., 0.], [1., 1., 1., 1.],
                          [0., 0., 2., -1.], [0.7, -1.9, -0.5, 0.3]])
    expected = np.asarray([[0.0000, 0.0000, 1.0000, 1.0000],
                           [0.1409, 0.1409, 2.8591, 2.8591],
                           [0.0000, 0.3161, 4.1945, 0.6839],
                           [5.0000, 5.0000, 5.0000, 5.0000]])
    out = np.asarray(delta2bbox(rois, deltas, max_shape=(32, 32)))
    np.testing.assert_allclose(out, expected, atol=1e-4)
    # batched decode agrees with per-image decode
    b_out = np.asarray(delta2bbox(jnp.tile(rois, (2, 1, 1)),
                                  jnp.tile(deltas, (2, 1, 1)),
                                  max_shape=(32, 32)))
    np.testing.assert_allclose(b_out[0], expected, atol=1e-4)


# -- AnchorGenerator (test_anchor.py:286-304) --------------------------------


def test_anchor_generator_square_stride_golden():
    gen = AnchorGenerator([10], ratios=[1.0], scales=[1.0], base_sizes=[10])
    anchors = np.asarray(gen.grid_anchors([(2, 2)])[0])
    expected = np.asarray([[-5., -5., 5., 5.], [5., -5., 15., 5.],
                           [-5., 5., 5., 15.], [5., 5., 15., 15.]])
    np.testing.assert_array_equal(anchors, expected)


def test_anchor_generator_rect_stride_golden():
    gen = AnchorGenerator([(10, 20)], ratios=[1.0], scales=[1.0],
                          base_sizes=[10])
    anchors = np.asarray(gen.grid_anchors([(2, 2)])[0])
    expected = np.asarray([[-5., -5., 5., 5.], [5., -5., 15., 5.],
                           [-5., 15., 5., 25.], [5., 15., 15., 25.]])
    np.testing.assert_array_equal(anchors, expected)


# -- MlvlPointGenerator (test_anchor.py:11-60) -------------------------------


def test_point_generator_strides_and_offset_golden():
    pts = MlvlPointGenerator(strides=[4, 10], offset=0.0)
    pts_half = MlvlPointGenerator(strides=[4, 10], offset=0.5)
    priors = [np.asarray(p) for p in pts.grid_points([(2, 2), (4, 8)])]
    assert priors[0].shape == (4, 2)
    assert priors[1].shape == (4 * 8, 2)
    # neighbour spacing = stride
    assert (priors[0][1] - priors[0][0]).sum() == 4
    assert (priors[1][1] - priors[1][0]).sum() == 10
    half = [np.asarray(p) for p in pts_half.grid_points([(2, 2), (4, 8)])]
    # offset of 0.5*stride in both coords
    assert (half[0][0] - priors[0][0]).sum() == 4 * 0.5 * 2
    assert (half[1][0] - priors[1][0]).sum() == 10 * 0.5 * 2


# -- losses (test_losses.py:7-32 + analytic) ---------------------------------


def test_cross_entropy_golden():
    pred = jnp.asarray([[100.0, -100.0]])
    label = jnp.asarray([1])
    assert abs(float(L.cross_entropy(pred, label)) - 200.0) < 1e-3


def test_sigmoid_focal_loss_analytic():
    """At logit 0 every factor is known in closed form:
    p = 0.5, CE = log 2; positive channel: alpha (1-p)^gamma CE =
    0.25 * 0.25 * log2; negative channel: 0.75 * 0.25 * log2."""
    log2 = float(np.log(2.0))
    logits = jnp.zeros((1, 2))
    labels = jnp.asarray([0])           # class 0 positive, class 1 negative
    loss = float(L.sigmoid_focal_loss(logits, labels, reduction="sum"))
    expected = 0.25 * 0.25 * log2 + 0.75 * 0.25 * log2
    assert abs(loss - expected) < 1e-6


def test_giou_analytic():
    """[0,0,10,10] vs [5,5,15,15]: inter 25, union 175, IoU 1/7;
    enclosing 225 → GIoU = 1/7 - 50/225; loss = 1 - GIoU."""
    a = jnp.asarray([[0., 0., 10., 10.]])
    b = jnp.asarray([[5., 5., 15., 15.]])
    giou = float(bbox_overlaps(a, b, mode="giou", is_aligned=True)[0])
    expected = 1.0 / 7.0 - 50.0 / 225.0
    assert abs(giou - expected) < 1e-6
    loss = float(L.giou_loss(a, b, reduction="sum"))
    assert abs(loss - (1.0 - expected)) < 1e-6


# -- FCOS head behavior at the reference's scenario --------------------------
# (test_fcos_head.py:6-63: s=256, gt [[23.6667, 23.8757, 238.6326, 151.8874]])


def _tiny_fcos(num_classes=4):
    from dsl_tpu.models import build_detector

    cfg = dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type="FCOSHead", num_classes=num_classes,
                       in_channels=32, stacked_convs=1, feat_channels=32,
                       strides=[4, 8, 16, 32, 64], norm_on_bbox=True,
                       centerness_on_reg=True, center_sampling=False),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type="nms", iou_threshold=0.6),
                      max_per_img=10))
    return build_detector(cfg)


def _fcos_batch(gt, labels, s=256, k=4):
    n = len(gt)
    gtb = np.zeros((1, k, 4), np.float32)
    gtl = np.zeros((1, k), np.int32)
    val = np.zeros((1, k), bool)
    if n:
        gtb[0, :n] = gt
        gtl[0, :n] = labels
        val[0, :n] = True
    return dict(
        images=jnp.asarray(np.random.RandomState(0).rand(1, s, s, 3),
                           jnp.float32),
        gt_bboxes=jnp.asarray(gtb), gt_labels=jnp.asarray(gtl),
        gt_valid=jnp.asarray(val),
        ignore_bboxes=jnp.zeros((1, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((1, 2), bool),
    )


def test_fcos_loss_empty_vs_one_gt():
    from dsl_tpu.models.detectors.single_stage import detector_loss

    det = _tiny_fcos()
    variables = det.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 256, 256, 3), jnp.float32))

    _, logs_empty = detector_loss(det, variables, _fcos_batch([], []))
    assert float(logs_empty["loss_cls"]) > 0, "cls loss should be non-zero"
    assert float(logs_empty["loss_bbox"]) == 0, \
        "no box loss when there are no true boxes"

    gt = [[23.6667, 23.8757, 238.6326, 151.8874]]
    _, logs_one = detector_loss(det, variables, _fcos_batch(gt, [2]))
    assert float(logs_one["loss_cls"]) > 0
    assert float(logs_one["loss_bbox"]) > 0
    assert float(logs_one["loss_centerness"]) > 0


# -- COCOeval protocol golden (hand-derived) ---------------------------------


def test_coco_eval_hand_derived_golden():
    """Two images, one class.

    img1: GT [0,0,10,10]; dets: exact match @0.9 (TP at every IoU thr) and a
          far box @0.8 (always FP).
    img2: GT [0,0,20,20]; det [0,0,15,20] @0.7 → IoU 300/400 = 0.75, so TP
          for thresholds ≤ 0.75, FP above.

    Per IoU thr ≤ 0.75 (6 thrs): sorted (TP, FP, TP); npig=2 →
      rc = [.5, .5, 1.0], pr = [1, .5, 2/3] → envelope [1, 2/3, 2/3];
      101-pt AP = (51·1 + 50·(2/3)) / 101.
    Per thr ≥ 0.8 (4 thrs): (TP, FP, FP) →
      rc = [.5, .5, .5], pr envelope [1, .5, 1/3];
      AP = 51·1 / 101 (recalls > 0.5 interpolate to 0).
    mAP = (6·AP_lo + 4·AP_hi)/10.  AR@100 = (6·1 + 4·0.5)/10 = 0.8.
    """
    from dsl_tpu.core.eval.coco_eval import COCOEval
    from dsl_tpu.data.coco_api import COCO

    gt = COCO(dataset=dict(
        images=[dict(id=1, width=100, height=100),
                dict(id=2, width=100, height=100)],
        categories=[dict(id=1, name="c")],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[0, 0, 10, 10],
                 area=100, iscrowd=0),
            dict(id=2, image_id=2, category_id=1, bbox=[0, 0, 20, 20],
                 area=400, iscrowd=0)]))
    dts = [
        dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10], score=0.9),
        dict(image_id=1, category_id=1, bbox=[50, 50, 10, 10], score=0.8),
        dict(image_id=2, category_id=1, bbox=[0, 0, 15, 20], score=0.7),
    ]
    stats = COCOEval(gt, dts).evaluate()

    ap_lo = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    ap_hi = 51 * 1.0 / 101
    expected_map = (6 * ap_lo + 4 * ap_hi) / 10
    assert abs(stats["mAP"] - expected_map) < 1e-9, \
        f"{stats['mAP']} != {expected_map}"
    assert abs(stats["mAP_50"] - ap_lo) < 1e-9
    assert abs(stats["mAP_75"] - ap_lo) < 1e-9   # IoU .75 still matches
    assert abs(stats["AR_100"] - 0.8) < 1e-9
    # both GTs are 'small' (<32²); small AP equals overall, m/l undefined
    assert abs(stats["mAP_s"] - expected_map) < 1e-9
    assert stats["mAP_m"] == -1.0 and stats["mAP_l"] == -1.0


def test_coco_eval_crowd_ignore_golden():
    """A detection matching only a crowd GT is ignored, not a FP; the real GT
    unmatched → recall counts only the non-crowd GT."""
    from dsl_tpu.core.eval.coco_eval import COCOEval
    from dsl_tpu.data.coco_api import COCO

    gt = COCO(dataset=dict(
        images=[dict(id=1, width=100, height=100)],
        categories=[dict(id=1, name="c")],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[0, 0, 10, 10],
                 area=100, iscrowd=0),
            dict(id=2, image_id=1, category_id=1, bbox=[40, 40, 30, 30],
                 area=900, iscrowd=1)]))
    # det inside the crowd region only
    dts = [dict(image_id=1, category_id=1, bbox=[45, 45, 20, 20], score=0.9)]
    stats = COCOEval(gt, dts).evaluate()
    # ignored det, unmatched real GT: precision undefined at all recalls -> 0
    assert stats["mAP"] == 0.0
    # now add a perfect det for the real GT: crowd must not poison the match
    dts.append(dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10],
                    score=0.8))
    stats2 = COCOEval(gt, dts).evaluate()
    assert stats2["mAP"] == 1.0 and stats2["AR_100"] == 1.0


def test_tblr_coder_matches_mmdet_golden():
    """TBLRBBoxCoder(normalizer=15) decode golden (test_coder.py:78-95)."""
    from dsl_tpu.core.boxes import bboxes2tblr, tblr2bboxes

    rois = jnp.asarray([[0., 0., 1., 1.], [0., 0., 1., 1.],
                        [0., 0., 1., 1.], [5., 5., 5., 5.]])
    deltas = jnp.asarray([[0., 0., 0., 0.], [1., 1., 1., 1.],
                          [0., 0., 2., -1.], [0.7, -1.9, -0.5, 0.3]])
    expected = np.asarray([[0.5, 0.5, 0.5, 0.5],
                           [0.0, 0.0, 12.0, 13.0],
                           [0.0, 0.5, 0.0, 0.5],
                           [5.0, 5.0, 5.0, 5.0]])
    out = np.asarray(tblr2bboxes(rois, deltas, normalizer=15.0,
                                 max_shape=(13, 12)))
    np.testing.assert_allclose(out, expected, atol=1e-4)
    # batched path agrees
    b_out = np.asarray(tblr2bboxes(jnp.tile(rois, (2, 1, 1)),
                                   jnp.tile(deltas, (2, 1, 1)),
                                   normalizer=15.0, max_shape=(13, 12)))
    np.testing.assert_allclose(b_out[0], expected, atol=1e-4)
    # encode/decode round trip
    gts = jnp.asarray([[0.2, 0.1, 0.8, 0.9]])
    pri = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    enc = bboxes2tblr(pri, gts, normalizer=4.0)
    dec = np.asarray(tblr2bboxes(pri, enc, normalizer=4.0))
    np.testing.assert_allclose(dec[0], np.asarray(gts)[0], atol=1e-6)


def test_max_iou_assigner_mmdet_golden():
    """Pinned to the reference's own unit test
    (``tests/test_utils/test_assigner.py:15-37``): expected 1-based
    gt_inds [1, 0, 2, 0] -> our 0-based assigned [0, -1, 1, -1]."""
    from dsl_tpu.core.assigners import max_iou_assign

    boxes = jnp.asarray([[0., 0., 10., 10.], [10., 10., 20., 20.],
                         [5., 5., 15., 15.], [32., 32., 38., 42.]])
    gt = jnp.asarray([[[0., 0., 10., 9.], [0., 10., 10., 19.]]])
    gtl = jnp.asarray([[2, 3]], jnp.int32)
    gtv = jnp.ones((1, 2), bool)
    labels, assigned, weights, max_iou = max_iou_assign(
        boxes, gt, gtl, gtv, pos_iou_thr=0.5, neg_iou_thr=0.5,
        min_pos_iou=0.0, num_classes=5, match_low_quality=True)
    assert assigned[0].tolist() == [0, -1, 1, -1]
    assert labels[0].tolist() == [2, 5, 3, 5]

    # empty gt -> everything background (reference :66-84)
    labels2, assigned2, _, _ = max_iou_assign(
        boxes, gt, gtl, jnp.zeros((1, 2), bool), pos_iou_thr=0.5,
        neg_iou_thr=0.5, min_pos_iou=0.0, num_classes=5)
    assert assigned2[0].tolist() == [-1, -1, -1, -1]
    assert labels2[0].tolist() == [5, 5, 5, 5]


def test_point_assigner_mmdet_golden():
    """Pinned to ``tests/test_utils/test_assigner.py:155-170``: expected
    1-based gt_inds [1, 2, 1, 0] with the default pos_num=3."""
    from dsl_tpu.models.dense_heads.reppoints_head import \
        _point_assign_single

    pts = jnp.asarray([[0., 0.], [10., 10.], [5., 5.], [32., 32.]])
    lvls = jnp.zeros((4,))                      # stride 1 -> level 0
    gt = jnp.asarray([[0., 0., 10., 9.], [0., 10., 10., 19.]])
    gtl = jnp.asarray([1, 2], jnp.int32)
    gtv = jnp.ones((2,), bool)
    labels, assigned = _point_assign_single(pts, lvls, gt, gtl, gtv,
                                            num_classes=4, pos_num=3)
    assert assigned.tolist() == [0, 1, 0, -1]
    assert labels.tolist() == [1, 2, 1, 4]
