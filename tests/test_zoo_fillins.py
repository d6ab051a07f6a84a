"""RetinaSepBNHead, SSDNeck, DetectoRSResNeXt fill-in tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_retina_sepbn_head_shared_convs_separate_bn():
    from dsl_tpu.models.dense_heads.retina_head import (
        RetinaSepBNHead, retina_loss)

    head = RetinaSepBNHead(num_classes=4, in_channels=16, feat_channels=16,
                           stacked_convs=2, strides=(8, 16), num_ins=2)
    feats = [jnp.asarray(np.random.RandomState(i).rand(2, s, s, 16),
                         jnp.float32) for i, s in enumerate((8, 4))]
    variables = head.init(jax.random.PRNGKey(0), feats)
    cls_scores, bbox_preds = head.apply(variables, feats)
    assert cls_scores[0].shape == (2, 8, 8, 9 * 4)
    assert bbox_preds[1].shape == (2, 4, 4, 9 * 4)

    params = variables["params"]
    # conv kernels shared across levels: exactly stacked_convs cls convs
    assert "cls_conv0" in params and "cls_conv1" in params
    assert "cls_conv2" not in params
    # but BN is per (level, stack)
    for lvl in range(2):
        for s in range(2):
            assert f"cls_bn_l{lvl}_s{s}" in params

    batch = dict(
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[8., 8., 30., 30.]]]),
        gt_labels=jnp.asarray([[1], [2]], jnp.int32),
        gt_valid=jnp.ones((2, 1), bool))
    losses = retina_loss(head, cls_scores, bbox_preds, batch)
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_bbox"]))


def test_ssd_neck_shapes():
    from dsl_tpu.models.necks.ssd_neck import SSDNeck

    neck = SSDNeck(in_channels=(32, 64), out_channels=(32, 64, 48, 32),
                   level_strides=(2, 2), level_paddings=(1, 1))
    feats = [jnp.zeros((2, 16, 16, 32)), jnp.zeros((2, 8, 8, 64))]
    variables = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(variables, feats)
    assert len(outs) == 4
    assert outs[0].shape == (2, 16, 16, 32)      # passthrough
    assert outs[2].shape == (2, 4, 4, 48)
    assert outs[3].shape == (2, 2, 2, 32)


def test_ssd_neck_depthwise_l2norm():
    from dsl_tpu.models.necks.ssd_neck import SSDNeck

    neck = SSDNeck(in_channels=(32, 64), out_channels=(32, 64, 48),
                   level_strides=(2,), level_paddings=(1,),
                   l2_norm_scale=20.0, use_depthwise=True,
                   norm_cfg=dict(type="BN"))
    feats = [jnp.ones((1, 8, 8, 32)), jnp.ones((1, 4, 4, 64))]
    variables = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(variables, feats)
    assert outs[2].shape == (1, 2, 2, 48)
    # L2Norm: per-pixel channel norm == scale
    n = np.linalg.norm(np.asarray(outs[0])[0, 0, 0])
    assert np.isclose(n, 20.0, rtol=1e-4)


def test_detectors_resnext_grouped_width():
    from dsl_tpu.models.backbones.detectors_resnet import DetectoRSResNeXt

    bb = DetectoRSResNeXt(depth=50, groups=4, base_width=4,
                          sac_stages=(1, 2, 3), rfp_inplanes=None)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), imgs)
    outs = bb.apply(variables, imgs)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    # grouped width: stage-1 conv2 kernel is (3,3,width/groups,width)
    k = variables["params"]["stages_0_0"]["conv1"]["kernel"]
    assert k.shape[-1] == int(64 * (4 / 64.0)) * 4   # width = 16


def test_retina_loss_ghm_and_balanced_l1():
    from dsl_tpu.models.dense_heads.retina_head import RetinaHead, retina_loss

    feats = [jnp.asarray(np.random.RandomState(i).rand(1, s, s, 16),
                         jnp.float32) for i, s in enumerate((8, 4))]
    batch = dict(
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]]]),
        gt_labels=jnp.asarray([[1]], jnp.int32),
        gt_valid=jnp.ones((1, 1), bool))

    def run(loss_cls=None, loss_bbox=None):
        head = RetinaHead(num_classes=4, in_channels=16, feat_channels=16,
                          stacked_convs=1, strides=(8, 16),
                          loss_cls=loss_cls, loss_bbox=loss_bbox)
        variables = head.init(jax.random.PRNGKey(0), feats)
        cls_scores, bbox_preds = head.apply(variables, feats)
        return retina_loss(head, cls_scores, bbox_preds, batch)

    focal = run()
    ghm = run(loss_cls=dict(type='GHMC', bins=30, momentum=0.75),
              loss_bbox=dict(type='GHMR', mu=0.02, bins=10,
                             loss_weight=10.0))
    bal = run(loss_bbox=dict(type='BalancedL1Loss', beta=0.11))
    for d in (focal, ghm, bal):
        assert np.isfinite(float(d["loss_cls"]))
        assert np.isfinite(float(d["loss_bbox"]))
    assert not np.isclose(float(focal["loss_cls"]), float(ghm["loss_cls"]))
    assert not np.isclose(float(focal["loss_bbox"]), float(bal["loss_bbox"]))


def test_resnet_dcn_stages():
    from dsl_tpu.models.backbones.resnet import ResNet

    # v1 for the init-equivalence check: DCNv2's sigmoid(0)=0.5 modulation
    # halves every tap at init (same in mmcv), so only v1 equals the plain
    # conv with zero-init offsets
    bb = ResNet(depth=50, out_indices=(1, 2, 3), dcn=dict(type='DCN'),
                stage_with_dcn=(False, True, True, True))
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                       jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), imgs)
    outs = bb.apply(variables, imgs)
    assert [o.shape[-1] for o in outs] == [512, 1024, 2048]
    assert outs[0].shape[1] == 8      # stride 8 at c3 despite DCN stride-2
    # stage 2+ blocks carry offset convs; stage 1 does not
    p = variables["params"]
    assert "conv2_offset" in p["layer2_0"]
    assert "conv2_offset" not in p["layer1_0"]
    # zero-init offsets: DCNv2 block == plain conv at init
    bb_plain = ResNet(depth=50, out_indices=(1, 2, 3))
    vp = bb_plain.init(jax.random.PRNGKey(0), imgs)
    # graft the dcn kernel into the plain conv and compare forward
    import copy

    vp2 = copy.deepcopy(jax.tree_util.tree_map(np.asarray, vp))

    def visit(dst, src):
        for k, v in src.items():
            if k == "conv2_offset":
                continue
            if k == "conv2_kernel":
                dst["conv2"] = {"kernel": np.asarray(v)}
            elif isinstance(v, dict):
                visit(dst.setdefault(k, {}), v)
            else:
                dst[k] = np.asarray(v)

    visit(vp2["params"], jax.tree_util.tree_map(np.asarray, variables)["params"])
    outs_plain = bb_plain.apply(
        jax.tree_util.tree_map(jnp.asarray, vp2), imgs)
    for a, b in zip(outs, outs_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_context_block_plugin():
    from dsl_tpu.models.backbones.resnet import ResNet
    from dsl_tpu.models.layers import ContextBlock

    # identity at init (zero-init final conv)
    cb = ContextBlock(ratio=0.25)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16), jnp.float32)
    v = cb.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(cb.apply(v, x)), np.asarray(x))

    bb = ResNet(depth=50, out_indices=(2,), plugins=[
        dict(cfg=dict(type='ContextBlock', ratio=0.25),
             stages=(False, True, True, True), position='after_conv3')])
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), imgs)
    p = variables["params"]
    assert "plugin0" in p["layer2_0"]
    assert "plugin0" not in p["layer1_0"]
    outs = bb.apply(variables, imgs)
    assert outs[0].shape[-1] == 1024


def test_generalized_attention_plugin():
    from dsl_tpu.models.backbones.resnet import ResNet
    from dsl_tpu.models.layers import GeneralizedAttention

    ga = GeneralizedAttention(num_heads=4, attention_type="1111",
                              kv_stride=2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16), jnp.float32)
    v = ga.init(jax.random.PRNGKey(0), x)
    out = ga.apply(v, x)
    assert out.shape == x.shape
    # gamma zero-init -> identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    # non-zero gamma changes the output, all four terms finite
    v2 = {"params": dict(v["params"], gamma=jnp.asarray(1.0))}
    out2 = ga.apply(v2, x)
    assert np.isfinite(np.asarray(out2)).all()
    assert not np.allclose(np.asarray(out2), np.asarray(x))

    # each single-bit variant runs
    for at in ("1000", "0100", "0010", "0001"):
        g = GeneralizedAttention(num_heads=2, attention_type=at)
        vv = g.init(jax.random.PRNGKey(1), x)
        assert g.apply(vv, x).shape == x.shape

    bb = ResNet(depth=50, out_indices=(2,), plugins=[
        dict(cfg=dict(type='GeneralizedAttention', num_heads=8,
                      attention_type='0010', kv_stride=2),
             stages=(False, False, True, True), position='after_conv2')])
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), imgs)
    assert "plugin0" in variables["params"]["layer3_0"]
    assert "plugin0" not in variables["params"]["layer2_0"]
    outs = bb.apply(variables, imgs)
    assert outs[0].shape[-1] == 1024


def test_basicblock_rejects_dcn_loudly():
    """mmdet BasicBlock asserts dcn/plugins are None (reference
    mmdet/models/backbones/resnet.py:31-33); a silent plain-conv fallback
    would make every depth<50 dcn config compute the wrong thing."""
    from dsl_tpu.models.backbones.resnet import ResNet

    bb = ResNet(depth=18, dcn=dict(type="DCNv2"),
                stage_with_dcn=(False, True, True, True))
    with pytest.raises(NotImplementedError, match="BasicBlock"):
        bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


def test_resnext_dcn_grouped():
    from dsl_tpu.models.backbones.resnet import ResNeXt

    bb = ResNeXt(depth=50, groups=4, base_width=4, out_indices=(2,),
                 dcn=dict(type='DCNv2'),
                 stage_with_dcn=(False, True, True, True))
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                       jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), imgs)
    outs = bb.apply(variables, imgs)
    assert outs[0].shape[-1] == 1024
    assert np.isfinite(np.asarray(outs[0])).all()
    # grouped dcn kernel: (3,3,width/groups,width)
    k = variables["params"]["layer2_0"]["conv2_kernel"]
    width = int(128 * (4 / 64.0)) * 4
    assert k.shape == (3, 3, width // 4, width)


def test_retina_ghm_momentum_state_threading():
    from dsl_tpu.models.dense_heads.retina_head import RetinaHead, retina_loss

    head = RetinaHead(num_classes=4, in_channels=16, feat_channels=16,
                      stacked_convs=1, strides=(8, 16),
                      loss_cls=dict(type='GHMC', bins=10, momentum=0.75),
                      loss_bbox=dict(type='GHMR', mu=0.02, bins=10,
                                     momentum=0.5))
    feats = [jnp.asarray(np.random.RandomState(i).rand(1, s, s, 16),
                         jnp.float32) for i, s in enumerate((8, 4))]
    variables = head.init(jax.random.PRNGKey(0), feats)
    cls_scores, bbox_preds = head.apply(variables, feats)
    batch = dict(
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]]]),
        gt_labels=jnp.asarray([[1]], jnp.int32),
        gt_valid=jnp.ones((1, 1), bool))
    out1 = retina_loss(head, cls_scores, bbox_preds, batch)
    assert "state_ghm_acc_sum" in out1 and "state_ghm_r_acc_sum" in out1
    acc1 = out1["state_ghm_acc_sum"]
    assert acc1.shape == (10,) and float(acc1.sum()) > 0
    # feed the state back: EMA moves, loss stays finite
    out2 = retina_loss(head, cls_scores, bbox_preds,
                       dict(batch, ghm_acc_sum=acc1,
                            ghm_r_acc_sum=out1["state_ghm_r_acc_sum"]))
    assert np.isfinite(float(out2["loss_cls"]))
    # EMA algebra: acc1 = (1-m)*counts from zero, so the second update is
    # m*acc1 + (1-m)*counts = (m + 1) * acc1 = 1.75 * acc1 at m=0.75
    np.testing.assert_allclose(
        np.asarray(out2["state_ghm_acc_sum"])[np.asarray(acc1) > 0],
        1.75 * np.asarray(acc1)[np.asarray(acc1) > 0], rtol=1e-5)


def test_resnetv1d_and_reference_type_names():
    """ResNetV1d (deep 3x3 stem + avg-down shortcuts) and the reference
    config type names NASFCOS / HybridTaskCascade resolve."""
    import jax
    import jax.numpy as jnp

    import dsl_tpu.models  # noqa: F401 — populate the registries
    from dsl_tpu.registry import BACKBONES, DETECTORS

    assert DETECTORS.get("NASFCOS") is not None
    bk = BACKBONES.get("ResNetV1d")(depth=50, out_indices=(1, 2, 3))
    v = bk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert "stem_conv0" in v["params"] and "conv1" not in v["params"]
    # avg-down shortcut: downsample conv is stride-1 (1x1) after avg pool
    outs = bk.apply(v, jnp.ones((1, 64, 64, 3)))
    assert [o.shape[-1] for o in outs] == [512, 1024, 2048]
