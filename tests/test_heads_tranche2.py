"""Zoo tranche-2 heads: VFNet, AutoAssign, PAA — tiny-tensor forward/loss/
predict (the reference test strategy) + semantics checks (star offsets, EM
split, center prior)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict)


def _cfg(head):
    return dict(
        type={"VFNetHead": "VFNet", "AutoAssignHead": "AutoAssign",
              "PAAHead": "PAA"}[head["type"]],
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=head,
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=10))


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


HEADS = [
    dict(type="VFNetHead", num_classes=4, in_channels=32, feat_channels=32,
         stacked_convs=1, strides=[8, 16, 32, 64, 128]),
    dict(type="AutoAssignHead", num_classes=4, in_channels=32,
         feat_channels=32, stacked_convs=1, strides=[8, 16, 32, 64, 128]),
    dict(type="PAAHead", num_classes=4, in_channels=32, feat_channels=32,
         stacked_convs=1, strides=[8, 16, 32, 64, 128]),
]


@pytest.mark.parametrize("head", HEADS, ids=lambda h: h["type"])
def test_forward_loss_predict(head):
    det = build_detector(_cfg(head))
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    batch = _batch()
    total, logs = jax.jit(lambda v, b: detector_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    assert all(np.isfinite(float(v)) for v in logs.values())
    # loss differentiates the head params
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["bbox_head"]))
    assert gsum > 0

    dets, labels, valid = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)
    assert labels.shape == valid.shape == (2, 10)


def test_vfnet_star_offsets_geometry():
    """Uniform prediction (l,t,r,b) = stride places the star taps exactly at
    the box sides: total sampling position = base + offset = star point."""
    from dsl_tpu.models.dense_heads.vfnet_head import star_dcn_offset

    stride = 8.0
    pred = jnp.full((1, 2, 2, 4), stride)       # l=t=r=b = 1 feature px
    off = star_dcn_offset(pred, gradient_mul=1.0, stride=stride)
    # tap 0 (TL): star (-t, -l) = (-1, -1); base (-1, -1) -> offset 0
    assert float(off[0, 0, 0, 0]) == 0.0 and float(off[0, 0, 0, 1]) == 0.0
    # tap 1 (T): star (-1, 0); base (-1, 0) -> offset 0
    assert float(off[0, 0, 0, 2]) == 0.0 and float(off[0, 0, 0, 3]) == 0.0
    # tap 4 (C): star (0, 0); base (0, 0)
    assert float(off[0, 0, 0, 8]) == 0.0 and float(off[0, 0, 0, 9]) == 0.0
    # doubled box: tap 8 (BR) star (2, 2); base (1, 1) -> offset (1, 1)
    off2 = star_dcn_offset(pred * 2, gradient_mul=1.0, stride=stride)
    assert float(off2[0, 0, 0, 16]) == 1.0 and float(off2[0, 0, 0, 17]) == 1.0


def test_paa_gmm_separates_two_clusters():
    """sklearn-replica GMM (see also the exact-parity oracle in
    ``test_torch_oracle_heads2.py::test_paa_loss_matches_reference``)."""
    from dsl_tpu.models.dense_heads.paa_head import gmm_fit_predict_1d

    scores = jnp.asarray([0.1, 0.11, 0.12, 0.88, 0.9, 0.92, 0.95])
    mask = jnp.ones((7,), bool)
    fg0, logdens = gmm_fit_predict_1d(scores, mask)
    fg0 = np.asarray(fg0)
    assert fg0[:3].all()              # low-loss cluster -> component 0
    assert not fg0[3:].any()
    assert np.isfinite(np.asarray(logdens)).all()
    # masking drops samples from the fit: a lone high outlier left
    # unmasked among lows still splits low/high
    fg0m, _ = gmm_fit_predict_1d(scores, mask.at[5].set(False))
    fg0m = np.asarray(fg0m)
    assert fg0m[:3].all() and not fg0m[4]


def test_autoassign_center_prior_params_exist_and_move():
    head = dict(type="AutoAssignHead", num_classes=4, in_channels=32,
                feat_channels=32, stacked_convs=1,
                strides=[8, 16, 32, 64, 128])
    det = build_detector(_cfg(head))
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    p = variables["params"]["bbox_head"]
    assert p["center_prior_mean"].shape == (4, 2)
    assert p["center_prior_sigma"].shape == (4, 2)
    g = jax.grad(lambda v: detector_loss(det, v, _batch())[0])(variables)
    gm = g["params"]["bbox_head"]["center_prior_mean"]
    assert np.isfinite(np.asarray(gm)).all()
    assert float(jnp.abs(gm).sum()) > 0    # prior is actually learnable


def test_zoo_configs_build():
    from dsl_tpu.config import Config

    for path in ("configs/vfnet/vfnet_r50_fpn_1x_coco.py",
                 "configs/paa/paa_r50_fpn_1x_coco.py",
                 "configs/autoassign/autoassign_r50_fpn_8x2_1x_coco.py",
                 "configs/centernet/centernet_resnet18_dcnv2_140e_coco.py",
                 "configs/mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"):
        cfg = Config.fromfile(path)
        det = build_detector(dict(cfg.model))
        assert det is not None


def test_reppoints_forward_loss_predict():
    head = dict(type="RepPointsHead", num_classes=4, in_channels=32,
                feat_channels=32, point_feat_channels=32, stacked_convs=1,
                strides=[8, 16, 32, 64, 128])
    cfg = dict(
        type="RepPointsDetector",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5),
        bbox_head=head,
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.5), max_per_img=10))
    det = build_detector(cfg)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    batch = _batch()
    total, logs = jax.jit(lambda v, b: detector_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total))
    assert {"loss_cls", "loss_pts_init", "loss_pts_refine"} <= set(logs)
    # moment_transfer is learnable and receives gradient
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    gm = g["params"]["bbox_head"]["moment_transfer"]
    assert np.isfinite(np.asarray(gm)).all()

    dets, labels, valid = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)


def test_reppoints_points2bbox_minmax():
    from dsl_tpu.models.dense_heads.reppoints_head import (
        RepPointsHead, points2bbox)

    head = RepPointsHead(num_classes=4, transform_method="minmax",
                         num_points=2)
    # two points (y-first): (1, 2) and (5, 8) -> box x[2,8] y[1,5]
    pts = jnp.asarray([[1.0, 2.0, 5.0, 8.0]])
    box = np.asarray(points2bbox(head, pts, jnp.zeros((2,))))
    np.testing.assert_allclose(box[0], [2.0, 1.0, 8.0, 5.0])


def test_reppoints_point_assigner_levels():
    from dsl_tpu.models.dense_heads.reppoints_head import \
        _point_assign_single

    # points at two levels (stride 8 and 16)
    pts = jnp.asarray([[8.0, 8.0], [24.0, 8.0], [16.0, 16.0]])
    lvls = jnp.asarray([3.0, 3.0, 4.0])
    # a small gt (scale ~ matches lvl 3 range) centered near point 0
    gt = jnp.asarray([[4.0, 4.0, 36.0, 36.0]])   # sqrt(32*32)/4 = 8 -> lvl 3
    labels, assigned = _point_assign_single(
        pts, lvls, gt, jnp.asarray([2]), jnp.asarray([True]), num_classes=4)
    # nearest level-3 point to center (20, 20) is point 1 (24, 8)? no:
    # dists: p0 (8,8)->17.0, p1 (24,8)->12.6; p2 is level 4 -> excluded
    assert int(assigned[1]) == 0 and int(labels[1]) == 2
    assert int(assigned[0]) == -1 and int(assigned[2]) == -1


def test_fovea_targets_and_e2e():
    from dsl_tpu.models.dense_heads.fovea_head import (
        FoveaHead, _level_targets)

    head = FoveaHead(num_classes=4, strides=[8, 16, 32, 64, 128])
    # gt with sqrt(area)=48 -> hits level 0 (1..64) and level 1 (32..128)
    gt = jnp.asarray([[8.0, 8.0, 56.0, 56.0], [0.0] * 4])
    labels = jnp.asarray([2, 0])
    valid = jnp.asarray([True, False])
    lab, t, pos = _level_targets(head, 0, (8, 8), gt, labels, valid)
    assert float(pos.sum()) > 0
    # the gt center cell is positive with the right class
    ci = 4 * 8 + 4   # (y=4, x=4) at stride 8 -> point (36, 36) in box center
    assert int(lab[ci]) == 2
    # targets are log-space in [log(1/16), log(16)]
    assert float(jnp.abs(t).max()) <= np.log(16.0) + 1e-5
    # a level whose range misses the gt has no positives
    _, _, pos4 = _level_targets(head, 4, (1, 1), gt, labels, valid)
    assert float(pos4.sum()) == 0

    cfg = dict(
        type="FOVEA",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="FoveaHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128]),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.5), max_per_img=10))
    det = build_detector(cfg)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    batch = _batch()
    total, logs = jax.jit(lambda v, b: detector_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total))
    dets, labels2, valid2 = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)


FSAF_CFG = dict(
    type="FSAF",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=1, add_extra_convs="on_input", num_outs=5),
    bbox_head=dict(type="FSAFHead", num_classes=4, in_channels=32,
                   feat_channels=32, stacked_convs=1,
                   strides=[8, 16, 32, 64, 128]),
    test_cfg=dict(nms_pre=100, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=10))

FA_CFG = dict(
    type="RetinaNet",
    backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=1, add_extra_convs="on_input", num_outs=5),
    bbox_head=dict(type="FreeAnchorRetinaHead", num_classes=4,
                   in_channels=32, feat_channels=32, stacked_convs=1,
                   strides=[8, 16, 32, 64, 128], pre_anchor_topk=8),
    test_cfg=dict(nms_pre=100, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=10))

YOLOF_CFG = dict(
    type="YOLOF",
    backbone=dict(type="ResNet", depth=18, out_indices=(3,)),
    neck=dict(type="DilatedEncoder", in_channels=512, out_channels=64,
              block_mid_channels=32, num_residual_blocks=2),
    bbox_head=dict(type="YOLOFHead", num_classes=4, in_channels=64,
                   strides=[32], anchor_scales=[1, 2, 4]),
    test_cfg=dict(nms_pre=50, score_thr=0.05,
                  nms=dict(iou_threshold=0.6), max_per_img=10))


@pytest.mark.parametrize("cfg", [FSAF_CFG, FA_CFG, YOLOF_CFG],
                         ids=["FSAF", "FreeAnchor", "YOLOF"])
def test_tranche3_forward_loss_predict(cfg):
    det = build_detector(cfg)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    batch = _batch()
    total, logs = jax.jit(lambda v, b: detector_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    assert all(np.isfinite(float(v)) for v in logs.values()), logs
    g = jax.grad(lambda v: detector_loss(det, v, batch)[0])(variables)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g["params"]["bbox_head"]))
    assert gsum > 0

    dets, labels, valid = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * 2),
        scale_factors=jnp.ones((2, 4))))(variables, batch["images"])
    assert dets.shape == (2, 10, 5)


def test_free_anchor_mean_max_property():
    """Mean-max weighting concentrates on high-prob bag members."""
    from dsl_tpu.models.dense_heads.free_anchor_head import \
        FreeAnchorRetinaHead  # noqa: F401  (registered)

    p = jnp.asarray([[0.9, 0.1, 0.1]])
    w = 1.0 / jnp.clip(1.0 - p, 1e-12, None)
    w = w / w.sum(axis=-1, keepdims=True)
    bag = float((w * p).sum())
    assert bag > 0.7        # dominated by the 0.9 member
