import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models import (
    FPN, FCOSHead, ResNet, RLAResNet, build_detector, detector_loss,
    detector_predict, fcos_loss,
)

MODEL_CFG = dict(
    type="FCOS",
    backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3),
                  frozen_stages=1, style="caffe"),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048], out_channels=256,
              start_level=1, add_extra_convs="on_output", num_outs=5,
              relu_before_extra_convs=True),
    bbox_head=dict(type="FCOSHead", num_classes=80, in_channels=256,
                   stacked_convs=4, feat_channels=256,
                   strides=[8, 16, 32, 64, 128], norm_on_bbox=True,
                   centerness_on_reg=True, center_sampling=True,
                   conv_bias=True, loss_weight=3.0, soft_weight=1.0,
                   soft_warm_up=10),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(type="nms", iou_threshold=0.6), max_per_img=100),
)


def _tiny_model_cfg(num_classes=4):
    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in MODEL_CFG.items()}
    cfg["backbone"] = dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3))
    cfg["neck"] = dict(type="FPN", in_channels=[64, 128, 256, 512],
                       out_channels=32, start_level=1,
                       add_extra_convs="on_output", num_outs=5,
                       relu_before_extra_convs=True)
    cfg["bbox_head"] = dict(type="FCOSHead", num_classes=num_classes,
                            in_channels=32, stacked_convs=1, feat_channels=32,
                            strides=[8, 16, 32, 64, 128], norm_on_bbox=True,
                            centerness_on_reg=True, center_sampling=True,
                            loss_weight=3.0, soft_weight=1.0, soft_warm_up=10)
    return cfg


def test_resnet50_feature_shapes():
    model = ResNet(depth=50, style="caffe")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 16, 16, 256), (1, 8, 8, 512),
                      (1, 4, 4, 1024), (1, 2, 2, 2048)]


def test_rla_resnet_feature_shapes():
    model = RLAResNet(layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 16, 16, 256), (1, 8, 8, 512),
                      (1, 4, 4, 1024), (1, 2, 2, 2048)]
    # RLA recurrent convs are shared per stage: one kernel per stage
    params = variables["params"]
    assert "recurrent_conv0" in params and "recurrent_conv3" in params


def test_fpn_shapes():
    fpn = FPN(in_channels=(64, 128, 256, 512), out_channels=32, start_level=1,
              add_extra_convs="on_output", num_outs=5,
              relu_before_extra_convs=True)
    feats = [jnp.zeros((2, 32 // (2 ** i), 32 // (2 ** i), c))
             for i, c in enumerate((64, 128, 256, 512))]
    variables = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(variables, feats)
    assert [o.shape for o in outs] == [
        (2, 16, 16, 32), (2, 8, 8, 32), (2, 4, 4, 32),
        (2, 2, 2, 32), (2, 1, 1, 32)]


def test_detector_forward_and_loss():
    cfg = _tiny_model_cfg()
    det = build_detector(cfg)
    imgs = jnp.zeros((2, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    cls_scores, bbox_preds, cents = det.apply(variables, imgs, training=True)
    assert len(cls_scores) == 5
    assert cls_scores[0].shape == (2, 8, 8, 4)
    assert bbox_preds[0].shape == (2, 8, 8, 4)
    assert cents[0].shape == (2, 8, 8, 1)

    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[0., 0., 0., 0.]]]),
        gt_labels=jnp.asarray([[1], [0]], jnp.int32),
        gt_valid=jnp.asarray([[True], [False]]),
        ignore_bboxes=jnp.zeros((2, 1, 4)),
        ignore_valid=jnp.zeros((2, 1), bool),
        source_weight=jnp.asarray([1.0, 3.0]),
    )
    total, log_vars = detector_loss(det, variables, batch)
    assert np.isfinite(float(total))
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        assert k in log_vars and np.isfinite(float(log_vars[k]))
    # grads flow
    def f(v):
        return detector_loss(det, v, batch)[0]
    g = jax.grad(lambda p: f({**variables, "params": p}))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_detector_loss_empty_gt_finite():
    cfg = _tiny_model_cfg()
    det = build_detector(cfg)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.zeros((1, 3, 4)),
        gt_labels=jnp.zeros((1, 3), jnp.int32),
        gt_valid=jnp.zeros((1, 3), bool),
    )
    total, log_vars = detector_loss(det, variables, batch)
    assert np.isfinite(float(total))
    assert float(log_vars["loss_bbox"]) == 0.0  # no positives


def test_detector_predict_shapes():
    cfg = _tiny_model_cfg()
    det = build_detector(cfg)
    imgs = jnp.zeros((2, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    dets, labels, valid = detector_predict(
        det, variables, imgs,
        img_shapes=jnp.asarray([[64., 64.], [60., 50.]]),
        scale_factors=jnp.ones((2, 4)),
        test_cfg=dict(nms_pre=50, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=10))
    assert dets.shape == (2, 10, 5)
    assert labels.shape == (2, 10)
    assert valid.shape == (2, 10)


def test_si_soft_loss_pairs_levels():
    cfg = _tiny_model_cfg()
    det = build_detector(cfg)
    # batch of 3: [labeled, unlabeled-full, half-res copy] (odd batch, DSL si)
    imgs = jnp.zeros((3, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.zeros((3, 2, 4)),
        gt_labels=jnp.zeros((3, 2), jnp.int32),
        gt_valid=jnp.zeros((3, 2), bool),
        si_pair=dict(full=jnp.asarray(1), half=jnp.asarray(2)),
    )
    total, log_vars = detector_loss(det, variables, batch, cur_iter=0)
    assert "loss_sisoft" in log_vars
    assert np.isfinite(float(log_vars["loss_sisoft"]))
    # warmup: before soft_warm_up iters the weight is /1000
    _, lv_warm = detector_loss(det, variables, batch, cur_iter=0)
    _, lv_late = detector_loss(det, variables, batch, cur_iter=100)
    assert float(lv_late["loss_sisoft"]) == pytest.approx(
        float(lv_warm["loss_sisoft"]) * 1000.0, rel=1e-3)


def test_resnext_and_pafpn():
    from dsl_tpu.models import PAFPN, ResNeXt

    m = ResNeXt(depth=50, groups=32, base_width=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # grouped 3x3: kernel in-channels = width / groups
    assert v["params"]["layer1_0"]["conv2"]["kernel"].shape == (3, 3, 4, 128)
    feats = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert feats[-1].shape == (1, 2, 2, 2048)

    pafpn = PAFPN(in_channels=(64, 128, 256, 512), out_channels=32,
                  start_level=1, num_outs=5, add_extra_convs="on_input")
    ins = [jnp.zeros((1, 32 // 2 ** i, 32 // 2 ** i, c))
           for i, c in enumerate((64, 128, 256, 512))]
    v2 = pafpn.init(jax.random.PRNGKey(0), ins)
    outs = pafpn.apply(v2, ins)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32),
        (1, 2, 2, 32), (1, 1, 1, 32)]


def test_mobilenet_v2_shapes():
    from dsl_tpu.models import MobileNetV2

    m = MobileNetV2()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    feats = m.apply(v, jnp.zeros((1, 128, 128, 3)))
    assert [f.shape for f in feats] == [
        (1, 32, 32, 24), (1, 16, 16, 32), (1, 8, 8, 96), (1, 4, 4, 320)]
    # first stage has no expand conv (ratio 1)
    assert "expand_conv" not in v["params"]["layer1_0"]
    assert "expand_conv" in v["params"]["layer2_0"]


def test_fcos_head_dcn_on_last_conv():
    """dcn_on_last_conv swaps the towers' final conv for DCNv2 (reference
    anchor_free_head.py _init_cls_convs + configs/fcos/*dcn*); must build,
    forward, and actually create the offset convs."""
    import jax

    head = FCOSHead(num_classes=4, in_channels=32, feat_channels=32,
                    stacked_convs=2, dcn_on_last_conv=True)
    feats = tuple(jnp.zeros((1, s, s, 32)) for s in (16, 8, 4, 2, 1))
    variables = head.init(jax.random.PRNGKey(0), feats)
    names = set(variables["params"].keys())
    assert "cls_conv1_offset" in names and "reg_conv1_offset" in names
    assert "cls_conv1_kernel" in names
    cls, bbox, cent = head.apply(variables, feats, training=True)
    assert cls[0].shape == (1, 16, 16, 4)
    assert bbox[0].shape == (1, 16, 16, 4)


def test_wsconv_standardizes_kernel_per_out_channel():
    """WSConv == conv with the per-out-channel standardized kernel (mmcv
    conv_ws_2d: mean/unbiased-std over (kh, kw, Cin), eps=1e-5)."""
    import jax
    import numpy as np
    from dsl_tpu.models.layers import WSConv

    ws = WSConv(features=8, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                use_bias=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 10, 4), jnp.float32)
    variables = ws.init(jax.random.PRNGKey(0), x)
    out = ws.apply(variables, x)
    assert out.shape == (2, 8, 10, 8)

    k = np.asarray(variables["params"]["kernel"])      # (3, 3, 4, 8)
    flat = k.reshape(-1, 8)
    mean = flat.mean(0)
    std = flat.std(0, ddof=1)                          # torch .std() unbiased
    k_std = (k - mean) / (std + 1e-5)
    # standardized kernel stats per out channel
    f2 = k_std.reshape(-1, 8)
    np.testing.assert_allclose(f2.mean(0), 0.0, atol=1e-6)
    np.testing.assert_allclose(f2.std(0, ddof=1), 1.0, atol=1e-3)
    expected = jax.lax.conv_general_dilated(
        x, jnp.asarray(k_std), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    expected = expected + variables["params"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_resnet_gn_ws_forward():
    """ResNet-18 with conv_cfg=ConvWS + GN builds and keeps param naming
    (conv kernels live under the same conv names)."""
    import jax

    bk = ResNet(depth=18, out_indices=(0, 1, 2, 3),
                conv_cfg=dict(type="ConvWS"),
                norm_cfg=dict(type="GN", num_groups=32))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bk.init(jax.random.PRNGKey(0), x)
    outs = bk.apply(variables, x)
    assert [o.shape[-1] for o in outs] == [64, 128, 256, 512]
    assert "kernel" in variables["params"]["conv1"]
    assert "scale" in variables["params"]["bn1"]   # GN affine present
