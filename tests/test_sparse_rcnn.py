"""Sparse R-CNN: embedding proposals, DII stages, Hungarian set loss,
NMS-free predict."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.roi_heads.sparse_rcnn import (
    build_sparse_rcnn, init_sparse_rcnn_variables, sparse_rcnn_loss,
    sparse_rcnn_predict)


def _cfg(stages=2, p=8):
    dii = dict(type="DIIHead", num_classes=4, in_channels=32, roi_size=7,
               num_heads=4, feedforward_channels=64, num_cls_fcs=1,
               num_reg_fcs=1, dynamic_feat_channels=8)
    return dict(
        type="SparseRCNN",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=0, num_outs=4),
        rpn_head=dict(type="EmbeddingRPNHead", num_proposals=p,
                      proposal_feature_channel=32),
        bbox_heads=[dict(dii) for _ in range(stages)],
        test_cfg=dict(max_per_img=10, score_thr=0.0))


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
        gt_labels=jnp.asarray(np.tile([1, 2, 0], (b, 1)), jnp.int32),
        gt_valid=jnp.asarray(valid),
        img_shapes=jnp.asarray([[size, size]] * b, jnp.float32),
    )


def test_embedding_proposals_cover_image():
    det = build_sparse_rcnn(_cfg())
    imgs = jnp.zeros((2, 64, 64, 3))
    variables = init_sparse_rcnn_variables(det, jax.random.PRNGKey(0), imgs)
    props, feats = det.apply(variables,
                             jnp.asarray([[64.0, 64.0]] * 2),
                             method=det.rpn_forward)
    assert props.shape == (2, 8, 4)
    # init boxes = whole image
    np.testing.assert_allclose(np.asarray(props[0, 0]), [0, 0, 64, 64],
                               atol=1e-4)
    assert feats.shape == (2, 8, 32)


def test_sparse_rcnn_train_and_predict():
    det = build_sparse_rcnn(_cfg())
    batch = _batch()
    variables = init_sparse_rcnn_variables(det, jax.random.PRNGKey(0),
                                           batch["images"])
    total, logs = jax.jit(lambda v, b: sparse_rcnn_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    assert "s0.loss_cls" in logs and "s1.loss_iou" in logs
    g = jax.grad(lambda v: sparse_rcnn_loss(det, v, batch)[0])(variables)
    for sub in ("rpn_head", "bbox_heads_0", "bbox_heads_1"):
        gsum = sum(float(jnp.abs(l).sum())
                   for l in jax.tree_util.tree_leaves(g["params"][sub]))
        assert np.isfinite(gsum) and gsum > 0, sub

    dets, labels, valid = jax.jit(lambda v, im: sparse_rcnn_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)
    assert labels.shape == valid.shape == (2, 10)
