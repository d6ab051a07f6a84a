import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, two_stage_loss, two_stage_predict)


CFG = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=0, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  strides=[4, 8, 16, 32, 64]),
    bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                   roi_size=7, fc_channels=64),
    test_cfg=dict(rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                            max_per_img=10)),
)


def _setup():
    det = build_two_stage_detector(CFG)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                       jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    # initialize roi head params too (separate call path)
    roi_feats = jnp.zeros((4, 7, 7, 32))
    roi_vars = det.init(jax.random.PRNGKey(1), roi_feats,
                        method=det.roi_forward)
    # merge param trees
    params = dict(variables["params"])
    params.update(roi_vars["params"])
    variables = {**variables, "params": params}
    return det, variables, imgs


def test_two_stage_forward_and_proposals():
    det, variables, imgs = _setup()
    feats, (scores, deltas) = det.apply(variables, imgs, training=False)
    assert len(feats) == 5 and len(scores) == 5
    assert scores[0].shape == (2, 16, 16, 3)     # P2 stride 4, 3 ratios
    assert deltas[0].shape == (2, 16, 16, 12)

    from dsl_tpu.models.dense_heads.rpn_head import rpn_proposals

    props, psc, pvalid = rpn_proposals(det.rpn_head, scores, deltas,
                                       num_proposals=50)
    assert props.shape == (2, 50, 4)
    assert pvalid.shape == (2, 50)


def test_two_stage_loss_and_grads():
    det, variables, imgs = _setup()
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[8., 8., 30., 30.]]]),
        gt_labels=jnp.asarray([[1], [2]], jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
        img_shapes=jnp.asarray([[64., 64.]] * 2),
    )
    total, log_vars = two_stage_loss(det, variables, batch,
                                     rng_key=jax.random.PRNGKey(3),
                                     num_proposals=64, num_samples=32)
    assert np.isfinite(float(total))
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"):
        assert k in log_vars, k
        assert np.isfinite(float(log_vars[k]))

    g = jax.grad(lambda p: two_stage_loss(
        det, {**variables, "params": p}, batch,
        rng_key=jax.random.PRNGKey(3), num_proposals=64,
        num_samples=32)[0])(variables["params"])
    # both RPN and RoI head get gradients
    assert float(jnp.abs(
        g["rpn_head"]["rpn_cls"]["kernel"]).sum()) > 0
    assert float(jnp.abs(
        g["bbox_head"]["fc_cls"]["kernel"]).sum()) > 0


def test_two_stage_predict_shapes():
    det, variables, imgs = _setup()
    dets, labels, valid = two_stage_predict(
        det, variables, imgs, img_shapes=jnp.asarray([[64., 64.]] * 2),
        scale_factors=jnp.ones((2, 4)), num_proposals=64)
    assert dets.shape == (2, 10, 5)
    assert labels.shape == (2, 10)


def test_ohem_sampling_prefers_hard_negatives():
    """With OHEM, high-loss negatives (confident wrong class) are sampled
    ahead of easy ones."""
    from dsl_tpu.models.roi_heads.standard_roi_head import sample_rois

    # 8 proposals far from the single gt -> all negatives
    props = jnp.asarray([[40.0 + 2 * i, 40.0, 50.0 + 2 * i, 50.0]
                         for i in range(8)])
    pvalid = jnp.ones((8,), bool)
    gtb = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    gtl = jnp.asarray([0])
    gtv = jnp.asarray([True])
    hardness = jnp.asarray([0., 0., 0., 0., 0., 0., 0., 9.9]
                           + [0.0])                 # + gt-augmented row
    rois, labels, assigned, valid, is_pos = sample_rois(
        jax.random.PRNGKey(0), props, pvalid, gtb, gtl, gtv,
        num_classes=4, num_samples=3, neg_hardness=hardness)
    # the hardest negative (proposal 7) must be among the sampled rows
    sampled = np.asarray(rois)
    assert any(np.allclose(s, np.asarray(props[7])) for s in sampled)


def test_two_stage_loss_ohem_path_jits():
    det, variables, imgs = _setup()
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4.0, 4.0, 30.0, 30.0]]] * 2),
        gt_labels=jnp.zeros((2, 1), jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
        ignore_bboxes=jnp.zeros((2, 1, 4), jnp.float32),
        ignore_valid=jnp.zeros((2, 1), bool))
    total, logs = jax.jit(lambda v, b: two_stage_loss(
        det, v, b, rng_key=jax.random.PRNGKey(0), num_proposals=32,
        num_samples=16, ohem=True))(variables, batch)
    assert np.isfinite(float(total))


def test_sample_rois_pads_when_candidates_scarce():
    """Fewer candidates than the sampler budget (e.g. GA-RPN's one square
    anchor per location on a tiny image: 341 proposals < 512 samples) must
    pad to the fixed shape with valid=False rows, not silently return a
    shorter roi set (reference sampler just returns fewer;
    mmdet/core/bbox/samplers/random_sampler.py)."""
    from dsl_tpu.models.roi_heads.standard_roi_head import sample_rois

    props = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [2.0, 2.0, 12.0, 12.0],
                         [20.0, 20.0, 30.0, 30.0]])
    pvalid = jnp.ones((3,), bool)
    gtb = jnp.asarray([[1.0, 1.0, 11.0, 11.0]])
    gtl = jnp.zeros((1,), jnp.int32)
    gtv = jnp.ones((1,), bool)
    rois, labels, assigned, valid, is_pos = sample_rois(
        jax.random.PRNGKey(0), props, pvalid, gtb, gtl, gtv,
        num_classes=4, num_samples=16)
    assert rois.shape == (16, 4) and labels.shape == (16,)
    assert valid.shape == (16,) and is_pos.shape == (16,)
    v = np.asarray(valid)
    assert v.sum() <= 4 and not v[4:].any()       # pads are invalid
    assert (np.asarray(labels)[~v] == 4).all()    # pads are background
