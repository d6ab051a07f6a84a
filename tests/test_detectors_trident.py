"""DetectoRS (SAC + RFP) and TridentResNet: shape/semantics + e2e tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.backbones.detectors_resnet import DetectoRSResNet
from dsl_tpu.models.backbones.trident_resnet import TridentResNet
from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, two_stage_loss,
    two_stage_predict)


def test_detectors_resnet_rfp_forward():
    net = DetectoRSResNet(depth=50, stem_channels=8, rfp_inplanes=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(variables, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    # rfp_forward accepts stage-2..4 features and reuses the same params
    rfp_feats = [jnp.ones((1, outs[i + 1].shape[1], outs[i + 1].shape[2],
                           16)) for i in range(3)]
    outs2 = net.apply(variables, x, rfp_feats, method=net.rfp_forward)
    assert outs2[0].shape == outs[0].shape
    # zero-init rfp conv: first pass identical even with nonzero rfp feats
    np.testing.assert_allclose(np.asarray(outs2[3]), np.asarray(outs[3]),
                               atol=1e-5)


def test_trident_branches():
    net = TridentResNet(depth=50, stem_channels=8)
    x = jnp.zeros((2, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x, training=True)
    (train_out,) = net.apply(variables, x, training=True)
    assert train_out.shape[0] == 6                # 3 branches x batch 2
    (test_out,) = net.apply(variables, x, training=False)
    assert test_out.shape[0] == 2                 # single test branch


def test_detectors_faster_rcnn_e2e():
    cfg = dict(
        type="DetectoRS",
        backbone=dict(type="DetectoRSResNet", depth=50, stem_channels=8,
                      rfp_inplanes=32),
        neck=dict(type="RFP", in_channels=[256, 512, 1024, 2048],
                  out_channels=32, num_outs=5, rfp_steps=2,
                  aspp_out_channels=8,
                  rfp_backbone=dict(type="DetectoRSResNet", depth=50,
                                    stem_channels=8, rfp_inplanes=32)),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      strides=[4, 8, 16, 32, 64]),
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4,
                       in_channels=32, roi_size=7, fc_channels=64),
        test_cfg=dict(rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                                max_per_img=10)),
    )
    det = build_two_stage_detector(cfg)
    b = 2
    gt = np.zeros((b, 3, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    valid = np.zeros((b, 3), bool)
    valid[:, 0] = True
    batch = dict(
        images=jnp.asarray(np.random.RandomState(0).rand(b, 64, 64, 3),
                           jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, 3), jnp.int32),
        gt_valid=jnp.asarray(valid),
        img_shapes=jnp.asarray([[64, 64]] * b, jnp.float32),
    )
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0),
                                         batch["images"])
    total, logs = jax.jit(
        lambda v, bb: two_stage_loss(det, v, bb, num_proposals=32,
                                     num_samples=16))(variables, batch)
    assert np.isfinite(float(total)), logs
    dets, labels, vmask = jax.jit(lambda v, im: two_stage_predict(
        det, v, im, img_shapes=batch["img_shapes"],
        scale_factors=jnp.ones((b, 4)), num_proposals=32))(
        variables, batch["images"])
    assert dets.shape == (b, 10, 5)
