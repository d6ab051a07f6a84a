"""Standalone RPN / FastRCNN detectors + DropBlock / NormedConv utils."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.detectors.two_stage import (
    RPN, FastRCNN, fast_rcnn_predict, rpn_only_loss, rpn_only_predict)
from dsl_tpu.models.layers import DropBlock, NormedConv, NormedLinear
from dsl_tpu.registry import MODELS, build_from_cfg


def _batch(b=2, size=64):
    gt = np.zeros((b, 3, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    valid = np.zeros((b, 3), bool)
    valid[:, 0] = True
    return dict(
        images=jnp.asarray(np.random.RandomState(0).rand(b, size, size, 3),
                           jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, 3), jnp.int32),
        gt_valid=jnp.asarray(valid),
        img_shapes=jnp.asarray([[size, size]] * b, jnp.float32),
    )


def _parts():
    backbone = build_from_cfg(dict(type="ResNet", depth=18,
                                   out_indices=(0, 1, 2, 3)), MODELS)
    neck = build_from_cfg(dict(type="FPN", in_channels=[64, 128, 256, 512],
                               out_channels=32, start_level=0, num_outs=5),
                          MODELS)
    rpn = build_from_cfg(dict(type="RPNHead", in_channels=32,
                              feat_channels=32,
                              strides=[4, 8, 16, 32, 64]), MODELS)
    return backbone, neck, rpn


def test_rpn_only_detector():
    backbone, neck, rpn = _parts()
    det = RPN(backbone=backbone, neck=neck, rpn_head=rpn)
    batch = _batch()
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    total, logs = jax.jit(lambda v, b: rpn_only_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total))
    dets, labels, valid = jax.jit(lambda v, im: rpn_only_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((2, 4)), num_proposals=32))(
        variables, batch["images"])
    assert dets.shape == (2, 32, 5)
    assert int(labels.max()) == 0


def test_fast_rcnn_with_external_proposals():
    backbone, neck, _ = _parts()
    bbox_head = build_from_cfg(dict(type="Shared2FCBBoxHead", num_classes=4,
                                    in_channels=32, roi_size=7,
                                    fc_channels=64), MODELS)
    det = FastRCNN(backbone=backbone, neck=neck, bbox_head=bbox_head,
                   test_cfg=dict(rcnn=dict(score_thr=0.01,
                                           nms=dict(iou_threshold=0.5),
                                           max_per_img=10)))
    batch = _batch()
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    rf = jnp.zeros((1, 7, 7, 32))
    rv = det.init(jax.random.PRNGKey(1), rf, method=det.roi_forward)
    params = dict(variables["params"])
    params.update(rv["params"])
    variables = {**variables, "params": params}
    props = jnp.asarray(np.tile([[4, 4, 44, 44], [16, 20, 60, 62]],
                                (2, 1, 1)), jnp.float32)
    pvalid = jnp.ones((2, 2), bool)
    dets, labels, valid = jax.jit(lambda v, im: fast_rcnn_predict(
        det, v, im, props, pvalid, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)


def test_dropblock_and_normed_layers():
    x = jnp.ones((1, 16, 16, 4))
    db = DropBlock(drop_prob=0.3, block_size=3)
    v = db.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x, training=True)
    y_eval = db.apply(v, x, training=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))
    y_tr = db.apply(v, x, training=True,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert float((np.asarray(y_tr) == 0).mean()) > 0   # blocks dropped

    nc = NormedConv(features=8, kernel_size=3)
    vv = nc.init(jax.random.PRNGKey(0), x)
    out = nc.apply(vv, x)
    assert out.shape == (1, 16, 16, 8)
    nl = NormedLinear(features=8)
    vl = nl.init(jax.random.PRNGKey(0), jnp.ones((2, 4)))
    out2 = nl.apply(vl, jnp.ones((2, 4)))
    # normalized rows: |out| <= temperature
    assert float(jnp.abs(out2).max()) <= 20.0 + 1e-4
