"""Grid R-CNN: grid targets/decode semantics + end-to-end train/test
forward with the cls-only bbox head."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.roi_heads.grid_head import (
    GridHead, _sub_regions, grid_decode, grid_targets)
from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, grid_rcnn_predict, init_two_stage_variables,
    two_stage_loss)

CFG = dict(
    type="GridRCNN",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=0, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  strides=[4, 8, 16, 32, 64]),
    bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                   roi_size=7, fc_channels=64, with_reg=False),
    grid_head=dict(type="GridHead", grid_points=9, num_convs=2,
                   roi_size=14, in_channels=32, point_feat_channels=8),
    test_cfg=dict(rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                            max_per_img=10)),
)


def _batch(b=2, size=64, k=3):
    rng = np.random.RandomState(0)
    gt = np.zeros((b, k, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [20, 24, 56, 60]
    valid = np.zeros((b, k), bool)
    valid[:, :2] = True
    return dict(
        images=jnp.asarray(rng.rand(b, size, size, 3), jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, k), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
        img_shapes=jnp.asarray([[size, size]] * b, jnp.float32),
    )


def test_grid_targets_and_decode_roundtrip():
    """Targets put a disc at each gt grid point; turning targets into
    logits and decoding recovers the gt box (radius-limited precision)."""
    head = GridHead(grid_points=9, roi_size=14)
    roi = jnp.asarray([[20.0, 20.0, 44.0, 44.0]])
    gt = jnp.asarray([[22.0, 21.0, 42.0, 43.0]])
    t = grid_targets(head, roi, gt, jnp.asarray([1.0]))
    half = head.whole_map_size // 4 * 2
    assert t.shape == (1, half, half, 9)
    assert float(t.sum()) > 0                 # discs present
    # decode from perfect heatmaps
    logits = t * 20.0 - 10.0
    out = grid_decode(head, roi, logits)
    # each side recovered within ~1 heatmap cell of the expanded box scale
    cell = 2 * (44 - 20) / head.whole_map_size
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(gt[0]),
                               atol=2 * cell + 1e-3)


def test_sub_regions_cover_whole_map():
    subs, half = _sub_regions(9, 56)
    assert half == 28
    assert subs[0] == (0, 0)
    assert subs[-1] == (28, 28)
    for sx, sy in subs:
        assert 0 <= sx <= 28 and 0 <= sy <= 28


def test_grid_rcnn_train_and_predict():
    det = build_two_stage_detector(CFG)
    batch = _batch()
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0),
                                         batch["images"])
    total, logs = jax.jit(
        lambda v, b: two_stage_loss(det, v, b, num_proposals=64,
                                    num_samples=32))(variables, batch)
    assert np.isfinite(float(total)), logs
    assert "loss_grid" in logs and "loss_bbox" not in logs
    g = jax.grad(lambda v: two_stage_loss(det, v, batch, num_proposals=64,
                                          num_samples=32)[0])(variables)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["grid_head"]))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = jax.jit(lambda v, im: grid_rcnn_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((2, 4)), num_proposals=64))(
        variables, batch["images"])
    assert dets.shape == (2, 10, 5)
    assert labels.shape == valid.shape == (2, 10)
