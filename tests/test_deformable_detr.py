"""Deformable DETR: MSDeformAttention semantics + end-to-end
forward/loss/predict on tiny shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict)
from dsl_tpu.models.dense_heads.deformable_detr_head import MSDeformAttention


def test_msdeform_zero_offsets_sample_reference():
    """With zero offsets (the init), every sampled point equals the value at
    the reference location, so the output is a linear map of it."""
    attn = MSDeformAttention(embed_dims=8, num_heads=2, num_levels=1,
                             num_points=2)
    v = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 8), jnp.float32)
    q = jnp.zeros((1, 3, 8))
    ref = jnp.asarray([[[0.5, 0.5], [0.125, 0.125], [0.875, 0.375]]])
    variables = attn.init(jax.random.PRNGKey(0), q, [v], ref)
    out = attn.apply(variables, q, [v], ref)
    assert out.shape == (1, 3, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def _cfg():
    return dict(
        type="DeformableDETR",
        backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
        neck=dict(type="ChannelMapper", in_channels=[128, 256, 512],
                  out_channels=32, num_outs=4),
        bbox_head=dict(type="DeformableDETRHead", num_classes=4,
                       embed_dims=32, num_query=12, num_heads=4,
                       num_levels=4, num_points=2, num_encoder_layers=1,
                       num_decoder_layers=2, ffn_dim=32),
        test_cfg=dict(max_per_img=10, score_thr=0.0))


def test_forward_loss_predict():
    det = build_detector(_cfg())
    b = 2
    rng = np.random.RandomState(0)
    gt = np.zeros((b, 3, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [24, 24, 60, 60]
    valid = np.zeros((b, 3), bool)
    valid[:, :2] = True
    batch = dict(
        images=jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(np.tile([1, 0, 0], (b, 1)), jnp.int32),
        gt_valid=jnp.asarray(valid),
    )
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    total, logs = jax.jit(lambda v, bb: detector_loss(det, v, bb))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    assert "loss_cls" in logs and "loss_iou_aux0" in logs
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["bbox_head"]))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, vmask = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * b),
        scale_factors=jnp.ones((b, 4))))(variables, batch["images"])
    assert dets.shape == (b, 10, 5)

def test_two_stage_ranks_proposals_by_class0_logit():
    """Two-stage proposal selection pins the reference's topk criterion:
    ``enc_outputs_class[..., 0]`` ALONE (transformer.py:648-650), not the
    max over classes.  Captures the full encoder cls map and asserts the
    stage-0 (encoder) outputs are exactly the class-0-logit top-k gather."""
    cfg = _cfg()
    cfg["bbox_head"].update(num_query=8, as_two_stage=True)
    det = build_detector(cfg)
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(3), images)
    outs, state = det.apply(
        variables, images, capture_intermediates=True,
        mutable=["intermediates"])
    cls_out, box_out = outs
    inter = state["intermediates"]["bbox_head"]
    enc_cls = inter["enc_cls_branch"]["__call__"][0]     # (B, S, C)
    assert enc_cls.shape[1] > 8, "need more positions than queries"
    _, top = jax.lax.top_k(enc_cls[..., 0], 8)
    expect = jnp.take_along_axis(enc_cls, top[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(cls_out[:, 0]),
                               np.asarray(expect), rtol=1e-6)
    # and NOT the max-ranking gather (they must differ for this input)
    _, top_max = jax.lax.top_k(jnp.max(enc_cls, -1), 8)
    assert not np.array_equal(np.asarray(top), np.asarray(top_max)), \
        "degenerate input: class-0 and max rankings coincide"


def test_two_stage_more_queries_than_positions():
    """Two-stage encoder proposals when num_query exceeds the encoder
    position count (tiny inputs): top-k clamps and repeats proposals
    modularly instead of crashing (deformable_detr_head.py two-stage
    branch; hit by the 64x64 unique-model sweep on the twostage_refine
    config whose num_query=300 > 85 positions)."""
    cfg = _cfg()
    cfg["bbox_head"].update(num_query=120, as_two_stage=True,
                            with_box_refine=True)
    det = build_detector(cfg)
    b = 1
    rng = np.random.RandomState(1)
    batch = dict(
        images=jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32),
        gt_bboxes=jnp.asarray([[[8., 8., 40., 40.]]]),
        gt_labels=jnp.zeros((b, 1), jnp.int32),
        gt_valid=jnp.ones((b, 1), bool),
    )
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    total, logs = detector_loss(det, variables, batch)
    assert np.isfinite(float(total)), logs
    dets, labels, vmask = detector_predict(
        det, variables, batch["images"],
        img_shapes=jnp.asarray([[64.0, 64.0]] * b),
        scale_factors=jnp.ones((b, 4)))
    assert np.isfinite(np.asarray(dets)).all()
