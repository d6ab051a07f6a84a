"""SABL: bucketing coder golden semantics + SABLRetinaHead
forward/loss/predict."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.core.bucket_coder import bbox2bucket, bucket2bbox
from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict)


def test_bucket_coder_roundtrip():
    """Encode a gt against a proposal, build perfect predictions from the
    targets, decode -> recover the gt box."""
    proposals = jnp.asarray([[10.0, 10.0, 50.0, 50.0],
                             [0.0, 0.0, 32.0, 64.0]])
    gt = jnp.asarray([[12.0, 14.0, 48.0, 46.0],
                      [2.0, 4.0, 30.0, 60.0]])
    num_buckets, scale = 14, 1.8
    offsets, ow, blabels, cw = bbox2bucket(proposals, gt, num_buckets, scale)
    side = 7
    assert offsets.shape == (2, 4 * side)
    # nearest bucket's offset magnitude <= 0.5 bucket
    best = jnp.argmax(blabels.reshape(2, 4, side), axis=-1)
    sel = jnp.take_along_axis(offsets.reshape(2, 4, side),
                              best[..., None], axis=-1)[..., 0]
    assert float(jnp.abs(sel).max()) <= 0.5 + 1e-4

    # perfect predictions: bucket logits = 10*one-hot, offsets = targets
    boxes, conf = bucket2bbox(proposals, blabels * 10.0, offsets,
                              num_buckets, scale)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(gt), atol=1e-3)
    assert np.all(np.asarray(conf) > 0.5)


def test_bucket_weights_topk():
    """offset_topk=2: nearest bucket weight 1; second gets weight only if
    |offset| < upperbound (reference bbox2bucket :214-233)."""
    proposals = jnp.asarray([[0.0, 0.0, 14.0, 14.0]])   # bucket size 1
    gt = jnp.asarray([[0.2, 0.2, 13.8, 13.8]])
    offsets, ow, blabels, cw = bbox2bucket(proposals, gt, 14, 1.0,
                                           offset_topk=2,
                                           offset_upperbound=1.0)
    ow = np.asarray(ow.reshape(4, 7))
    # nearest bucket (center 0.5 vs gt 0.2 -> off 0.3) weight 1;
    # second (center 1.5, off 1.3 > 1.0) weight 0
    assert ow[0, 0] == 1.0 and ow[0, 1] == 0.0


def test_sabl_retina_forward_loss_predict():
    cfg = dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="SABLRetinaHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.5), max_per_img=10))
    det = build_detector(cfg)
    b = 2
    gt = np.zeros((b, 3, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [24, 24, 60, 60]
    valid = np.zeros((b, 3), bool)
    valid[:, :2] = True
    batch = dict(
        images=jnp.asarray(np.random.RandomState(0).rand(b, 64, 64, 3),
                           jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(np.tile([1, 0, 0], (b, 1)), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
    )
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    total, logs = jax.jit(lambda v, bb: detector_loss(det, v, bb))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    assert {"loss_cls", "loss_bbox_cls", "loss_bbox_reg"} <= set(logs)
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["bbox_head"]))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, vmask = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * b),
        scale_factors=jnp.ones((b, 4))))(variables, batch["images"])
    assert dets.shape == (b, 10, 5)
