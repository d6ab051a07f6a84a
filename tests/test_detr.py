"""DETR tier: Hungarian matcher, transformer, set-prediction loss/decode."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.core.hungarian import (bbox_l1_cost, classification_cost,
                                    hungarian_match, iou_cost)
from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict)

CFG = dict(
    type="DETR",
    backbone=dict(type="ResNet", depth=18, out_indices=(3,)),
    bbox_head=dict(type="DETRHead", num_classes=4, in_channels=512,
                   embed_dims=32, num_query=8, num_heads=4,
                   num_encoder_layers=2, num_decoder_layers=2, ffn_dim=64),
    test_cfg=dict(score_thr=0.05, max_per_img=8))


def test_hungarian_matches_bruteforce():
    rng = np.random.RandomState(0)
    cost = rng.rand(2, 5, 3).astype(np.float32)
    valid = np.ones((2, 3), bool)
    out = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(valid)))
    for b in range(2):
        # brute force optimal assignment of 3 gts to 5 queries
        best, best_cost = None, np.inf
        for perm in itertools.permutations(range(5), 3):
            c = sum(cost[b, perm[g], g] for g in range(3))
            if c < best_cost:
                best_cost, best = c, perm
        got_cost = sum(cost[b, qi, out[b, qi]]
                       for qi in range(5) if out[b, qi] >= 0)
        assert abs(got_cost - best_cost) < 1e-6
        assert (out[b] >= 0).sum() == 3


def test_hungarian_respects_validity_and_jit():
    cost = jnp.asarray(np.random.RandomState(1).rand(1, 4, 3), jnp.float32)
    valid = jnp.asarray([[True, True, False]])
    out = jax.jit(hungarian_match)(cost, valid)
    assert int((np.asarray(out)[0] >= 0).sum()) == 2
    assert 2 not in np.asarray(out)[0]          # padded gt never assigned


def test_match_costs():
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    labels = jnp.asarray([0, 1])
    c = np.asarray(classification_cost(logits, labels))
    assert c[0, 0] < c[0, 1] and c[1, 1] < c[1, 0]
    pred = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    gt = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1]])
    l1 = np.asarray(bbox_l1_cost(pred, gt))
    assert l1[0, 0] < l1[0, 1]
    xy = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    g = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    ic = np.asarray(iou_cost(xy, g))
    assert ic[0, 0] == -1.0 and ic[0, 1] > ic[0, 0]


def _batch(b=1, size=64, k=3):
    gt = np.zeros((b, k, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [24, 24, 60, 60]
    valid = np.zeros((b, k), bool)
    valid[:, :2] = True
    return dict(
        images=jnp.asarray(np.random.RandomState(0).rand(b, size, size, 3),
                           jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(np.tile([1, 0, 0], (b, 1)), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
    )


def test_detr_forward_loss_predict():
    det = build_detector(CFG)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    batch = _batch()
    total, logs = jax.jit(lambda v, b: detector_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total))
    # main + aux losses from every decoder layer
    assert {"loss_cls", "loss_bbox", "loss_iou",
            "loss_cls_aux0", "loss_bbox_aux0"} <= set(logs)
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    gq = g["params"]["bbox_head"]["query_embed"]
    assert np.isfinite(np.asarray(gq)).all()
    assert float(jnp.abs(gq).sum()) > 0

    dets, labels, valid = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]]),
        scale_factors=jnp.ones((1, 4))))(variables, batch["images"])
    assert dets.shape == (1, 8, 5)


def test_detr_loss_zero_for_perfect_prediction():
    """Construct head outputs that exactly predict the GT set -> cls loss
    tiny, bbox/iou losses ~0."""
    from dsl_tpu.models.dense_heads.detr_head import (
        DETRHead, detr_loss, xyxy_to_cxcywh)

    head = DETRHead(num_classes=4, num_query=4, num_decoder_layers=1)
    batch = _batch()
    factor = jnp.asarray([64.0, 64.0, 64.0, 64.0])
    gtn = xyxy_to_cxcywh(batch["gt_bboxes"][0] / factor)    # (3, 4)
    bbox = jnp.zeros((1, 1, 4, 4)).at[0, 0, :3].set(gtn)
    bbox = bbox.at[0, 0, 3].set(jnp.asarray([0.9, 0.9, 0.05, 0.05]))
    cls = jnp.full((1, 1, 4, 5), -20.0)
    cls = cls.at[0, 0, 0, 1].set(20.0)      # query0 -> class 1 (gt0)
    cls = cls.at[0, 0, 1, 0].set(20.0)      # query1 -> class 0 (gt1)
    cls = cls.at[0, 0, 2, 4].set(20.0)      # background
    cls = cls.at[0, 0, 3, 4].set(20.0)
    losses = detr_loss(head, (cls, bbox), batch)
    # queries 0/1 should be matched to gts 0/1; bbox+iou losses vanish...
    assert float(losses["loss_bbox"]) < 1e-3
    assert float(losses["loss_iou"]) < 1e-3
    # ...except query 2 was forced to match gt... no: only 2 valid gts, and
    # they're taken by the perfect queries, so cls loss is near zero too
    assert float(losses["loss_cls"]) < 1e-3


def test_sine_positional_encoding_shape():
    from dsl_tpu.models.utils.transformer import sine_positional_encoding

    pos = sine_positional_encoding(jnp.ones((2, 4, 6)), num_feats=16)
    assert pos.shape == (2, 4, 6, 32)
    assert np.isfinite(np.asarray(pos)).all()
