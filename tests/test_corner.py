"""CornerNet family: Hourglass backbone, CornerHead/CentripetalHead
tiny-tensor forward/loss/predict + target semantics (the reference test
strategy, ``tests/test_models/test_dense_heads``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict)
from dsl_tpu.models.dense_heads.corner_head import corner_targets


def _cfg(head_type="CornerHead", emb=1):
    return dict(
        type="CornerNet" if head_type == "CornerHead" else "CentripetalNet",
        backbone=dict(type="HourglassNet", downsample_times=3, num_stacks=2,
                      stage_channels=[16, 16, 24, 24], feat_channel=16,
                      stage_blocks=[1, 1, 1, 1]),
        bbox_head=dict(type=head_type, num_classes=4, in_channels=16,
                       num_feat_levels=2, corner_emb_channels=emb),
        test_cfg=dict(corner_topk=12, local_maximum_kernel=3,
                      distance_threshold=0.5, score_thr=0.05,
                      nms=dict(iou_threshold=0.5), max_per_img=10))


def _batch(b=2, size=64, k=3):
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


def test_hourglass_shapes():
    from dsl_tpu.models.backbones.hourglass import HourglassNet

    net = HourglassNet(downsample_times=3, num_stacks=2,
                       stage_channels=[16, 16, 24, 24],
                       stage_blocks=[1, 1, 1, 1], feat_channel=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(variables, x)
    # stride-4 stem, one output per stack (reference hourglass.py:117-127)
    assert len(outs) == 2
    assert outs[0].shape == outs[1].shape == (1, 16, 16, 16)


@pytest.mark.parametrize("head_type,emb", [("CornerHead", 1),
                                           ("CentripetalHead", 0)])
def test_forward_loss_predict(head_type, emb):
    det = build_detector(_cfg(head_type, emb))
    batch = _batch()
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    total, logs = jax.jit(lambda v, b: detector_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    expected = {"det_loss", "off_loss"}
    expected |= ({"pull_loss", "push_loss"} if head_type == "CornerHead"
                 else {"guiding_loss", "centripetal_loss"})
    assert expected <= set(logs)
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["bbox_head"]))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)
    assert labels.shape == valid.shape == (2, 10)


def test_corner_targets_semantics():
    """Heatmap peaks land on the int corner pixels; offsets hold the
    fractional remainder (reference get_targets :412-457)."""
    from dsl_tpu.models.dense_heads.corner_head import CornerHead

    head = CornerHead(num_classes=4)
    gt = jnp.asarray([[[10.0, 6.0, 46.0, 38.0]]])       # one box
    labels = jnp.asarray([[2]], jnp.int32)
    valid = jnp.asarray([[True]])
    t = corner_targets(head, gt, labels, valid, (16, 16), (64, 64))
    # scale 16/64 = 0.25: tl (2.5, 1.5) -> idx (2, 1), br (11.5, 9.5)
    assert int(t["tl_x"][0, 0]) == 2 and int(t["tl_y"][0, 0]) == 1
    assert int(t["br_x"][0, 0]) == 11 and int(t["br_y"][0, 0]) == 9
    assert float(t["tl_heat"][0, 1, 2, 2]) == 1.0
    assert float(t["br_heat"][0, 9, 11, 2]) == 1.0
    np.testing.assert_allclose(np.asarray(t["tl_off"][0, 1, 2]),
                               [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t["br_off"][0, 9, 11]),
                               [0.5, 0.5], atol=1e-6)


def test_decode_recovers_planted_corners():
    """Plant perfect heatmaps/offsets/embeddings and check the decoded box."""
    from dsl_tpu.models.dense_heads.corner_head import (
        CornerHead, corner_get_bboxes)

    head = CornerHead(num_classes=4)
    fh = fw = 16
    tl_heat = np.full((1, fh, fw, 4), -10.0, np.float32)
    br_heat = np.full((1, fh, fw, 4), -10.0, np.float32)
    tl_heat[0, 2, 3, 1] = 10.0                     # tl at (y=2, x=3)
    br_heat[0, 10, 12, 1] = 10.0                   # br at (y=10, x=12)
    tl_emb = np.zeros((1, fh, fw, 1), np.float32)
    br_emb = np.zeros((1, fh, fw, 1), np.float32)
    tl_off = np.zeros((1, fh, fw, 2), np.float32)
    br_off = np.zeros((1, fh, fw, 2), np.float32)
    outputs = ((jnp.asarray(tl_heat),), (jnp.asarray(br_heat),),
               (jnp.asarray(tl_emb),), (jnp.asarray(br_emb),),
               (jnp.asarray(tl_off),), (jnp.asarray(br_off),))
    dets, labels, valid = corner_get_bboxes(
        head, outputs, corner_topk=8, max_per_img=5, score_thr=0.1)
    assert bool(valid[0, 0])
    assert int(labels[0, 0]) == 1
    # corners upscaled by the stride-4 stem
    np.testing.assert_allclose(np.asarray(dets[0, 0, :4]),
                               [12.0, 8.0, 48.0, 40.0], atol=1e-4)


def test_ae_loss_pull_push():
    from dsl_tpu.core.losses import ae_loss

    # two objects with identical tl/br embeddings far apart: pull 0, push>0
    tl = jnp.asarray([[[1.0], [5.0]]])
    br = jnp.asarray([[[1.0], [5.0]]])
    valid = jnp.asarray([[1.0, 1.0]])
    pull, push = ae_loss(tl, br, valid, pull_weight=1.0, push_weight=1.0)
    assert float(pull) == 0.0
    assert float(push) == 0.0                      # |1-5|=4 > margin 1
    # close means -> push penalty = margin - |diff|
    tl2 = jnp.asarray([[[1.0], [1.2]]])
    pull2, push2 = ae_loss(tl2, tl2, valid, pull_weight=1.0, push_weight=1.0)
    np.testing.assert_allclose(float(push2), 0.8, atol=1e-5)
