"""Deformable RoI pooling (dcn dpool/mdpool configs), config-driven OHEM,
and soft-NMS in the rcnn test path.

Reference surfaces: mmcv ``ops/deform_roi_pool.py`` (DeformRoIPoolPack /
ModulatedDeformRoIPoolPack), ``mmdet/core/bbox/samplers/ohem_sampler.py``,
``configs/faster_rcnn/faster_rcnn_r50_fpn_soft_nms_1x_coco.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.ops.roi_align import roi_align, deform_roi_align
from dsl_tpu.core.nms import multiclass_nms
from dsl_tpu.models.roi_heads.standard_roi_head import DeformRoIPoolPack
from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, two_stage_loss,
    two_stage_predict)


def _cfg(**extra):
    cfg = dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=50, base_channels=8,
                      stem_channels=8, out_indices=(0, 1, 2, 3),
                      frozen_stages=-1),
        neck=dict(type="FPN", in_channels=[32, 64, 128, 256],
                  out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      strides=[4, 8, 16, 32, 64]),
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4,
                       in_channels=32, roi_size=7, fc_channels=64))
    cfg.update(extra)
    return cfg


def _batch(imgs):
    return dict(
        images=imgs,
        gt_bboxes=jnp.asarray(
            [[[4.0, 4.0, 30.0, 30.0], [10.0, 10.0, 50.0, 50.0]]] * 2),
        gt_labels=jnp.zeros((2, 2), jnp.int32),
        gt_valid=jnp.ones((2, 2), bool),
        img_shapes=jnp.asarray([[64, 64]] * 2, jnp.float32))


def test_deform_roi_align_zero_offset_is_roi_align():
    f = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    rois = jnp.asarray([[0, 2.0, 2.0, 12.0, 12.0],
                        [1, 1.0, 3.0, 9.0, 15.0]])
    base = roi_align(f, rois, out_size=(7, 7), sampling_ratio=2)
    z = deform_roi_align(f, rois, jnp.zeros((2, 7, 7, 2)),
                         out_size=(7, 7), sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(base), np.asarray(z), atol=1e-5)
    # nonzero offsets actually move the sampling points
    o = deform_roi_align(
        f, rois, 0.5 * jax.random.normal(jax.random.PRNGKey(1), (2, 7, 7, 2)),
        out_size=(7, 7), sampling_ratio=2)
    assert float(jnp.abs(base - o).max()) > 1e-3


def test_deform_pack_identity_at_init():
    """Zero-init offset fc => dpool == plain align at init (the property the
    reference relies on for finetuning stability)."""
    pack = DeformRoIPoolPack(output_size=7, output_channels=8,
                             deform_fc_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 7, 7, 8))
    v = pack.init(jax.random.PRNGKey(1), x)
    off, mask = pack.apply(v, x)
    assert mask is None
    np.testing.assert_allclose(np.asarray(off), 0.0)


def test_dpool_faster_rcnn_trains_and_predicts():
    det = build_two_stage_detector(_cfg(
        roi_pool_pack=dict(type="ModulatedDeformRoIPoolPack", output_size=7,
                           output_channels=32, deform_fc_channels=32),
        test_cfg=dict(rcnn=dict(score_thr=0.05, max_per_img=10,
                                nms=dict(type="soft_nms",
                                         iou_threshold=0.5)))))
    imgs = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    v = init_two_stage_variables(det, jax.random.PRNGKey(0), imgs)
    assert "roi_pool_pack" in v["params"]
    batch = _batch(imgs)

    def loss(v):
        return two_stage_loss(det, v, batch, rng_key=jax.random.PRNGKey(0),
                              num_proposals=64, num_samples=32)[0]

    total = jax.jit(loss)(v)
    assert np.isfinite(float(total))
    g = jax.grad(loss)(v)
    for leaf in ("offset_fc2", "mask_fc1"):
        k = g["params"]["roi_pool_pack"][leaf]["kernel"]
        assert float(jnp.abs(k).sum()) > 0, leaf
    dets, labels, ov = jax.jit(lambda v: two_stage_predict(
        det, v, imgs, img_shapes=batch["img_shapes"], num_proposals=64))(v)
    assert dets.shape == (2, 10, 5)
    assert np.isfinite(np.asarray(dets)).all()


def test_ohem_sampler_config_driven():
    """sampler.type='OHEMSampler' in train_cfg.rcnn activates hard-negative
    mining (loss differs from the random-sampler loss under the same rng)."""
    imgs = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    batch = _batch(imgs)
    base = build_two_stage_detector(_cfg())
    v = init_two_stage_variables(base, jax.random.PRNGKey(0), imgs)
    l0 = float(two_stage_loss(base, v, batch, rng_key=jax.random.PRNGKey(0),
                              num_proposals=64, num_samples=32)[0])
    ohem = build_two_stage_detector(_cfg(
        train_cfg=dict(rcnn=dict(sampler=dict(type="OHEMSampler")))))
    l1 = float(two_stage_loss(ohem, v, batch, rng_key=jax.random.PRNGKey(0),
                              num_proposals=64, num_samples=32)[0])
    assert np.isfinite(l1) and l0 != l1


def test_multiclass_soft_nms():
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 10.0],
                         [1.0, 1.0, 11.0, 11.0],
                         [0.0, 0.0, 10.0, 10.0]])
    # rows: two overlapping class-0 dets, one identical class-1 det
    scores = jnp.asarray([[0.9, 0.0], [0.8, 0.0], [0.0, 0.85]])
    dets, labels, ov = multiclass_nms(
        boxes, scores, score_thr=0.05, iou_threshold=0.3, max_per_img=5,
        nms_type="soft_nms")
    d = np.asarray(dets)[np.asarray(ov)]
    lb = np.asarray(labels)[np.asarray(ov)]
    # soft-NMS keeps the overlapped class-0 box with a DECAYED score
    c0 = sorted(d[lb == 0][:, 4], reverse=True)
    assert abs(c0[0] - 0.9) < 1e-5
    assert 0.0 < c0[1] < 0.8 * (1 - 0.3)  # decayed below (1-iou)*s ceiling
    # the class-1 box is untouched by cross-class overlap
    assert abs(d[lb == 1][0, 4] - 0.85) < 1e-5
    # boxes come back un-offset
    np.testing.assert_allclose(d[lb == 1][0, :4], [0, 0, 10, 10], atol=1e-3)
