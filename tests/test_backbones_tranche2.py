"""Res2Net / HRNet / HRFPN: shape parity + config-driven detector builds."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.config import Config
from dsl_tpu.models import build_detector
from dsl_tpu.models.backbones.hrnet import HRNet
from dsl_tpu.models.backbones.res2net import Res2Net
from dsl_tpu.models.necks.hrfpn import HRFPN


def test_res2net_shapes_and_hierarchy():
    x = jnp.zeros((1, 64, 64, 3))
    bk = Res2Net(depth=50)
    v = bk.init(jax.random.PRNGKey(0), x)
    outs = bk.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]
    # a stage block has scales-1 hierarchical 3x3 convs
    blk = v["params"]["layer1_0"]
    assert {"conv2_0", "conv2_1", "conv2_2"} <= set(blk)
    assert "conv2_3" not in blk           # last split passes through
    assert "downsample_conv" in blk       # avg_down downsample


def test_hrnet_w18_shapes():
    x = jnp.zeros((1, 64, 64, 3))
    bk = HRNet()
    v = bk.init(jax.random.PRNGKey(0), x)
    outs = bk.apply(v, x)
    assert [o.shape[-1] for o in outs] == [18, 36, 72, 144]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]    # strides 4,8,16,32


def test_hrfpn_levels():
    feats = tuple(jnp.zeros((1, 16 // 2 ** i, 16 // 2 ** i, c))
                  for i, c in enumerate([18, 36, 72, 144]))
    neck = HRFPN()
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert len(outs) == 5
    assert all(o.shape[-1] == 256 for o in outs)
    assert outs[0].shape[1] == 16 and outs[4].shape[1] == 1


def test_hrnet_fcos_config_trains():
    from dsl_tpu.models.detectors.single_stage import detector_loss

    cfg = Config.fromfile("configs/hrnet/fcos_hrnetv2p_w18_gn-head_4x4_1x_coco.py")
    model = dict(cfg.model)
    # shrink for the test
    model["backbone"]["extra"] = dict(
        stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                    num_blocks=(1,), num_channels=(16,)),
        stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                    num_blocks=(1, 1), num_channels=(16, 32)),
        stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                    num_blocks=(1, 1, 1), num_channels=(16, 32, 64)),
        stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                    num_blocks=(1, 1, 1, 1), num_channels=(16, 32, 64, 128)))
    model["neck"]["in_channels"] = [16, 32, 64, 128]
    model["neck"]["out_channels"] = 32
    model["bbox_head"].update(num_classes=2, in_channels=32,
                              feat_channels=32, stacked_convs=1)
    det = build_detector(model)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]]),
        gt_labels=jnp.zeros((1, 1), jnp.int32),
        gt_valid=jnp.ones((1, 1), bool),
        ignore_bboxes=jnp.zeros((1, 1, 4), jnp.float32),
        ignore_valid=jnp.zeros((1, 1), bool))
    total, logs = jax.jit(lambda v, b: detector_loss(det, v, b))(
        variables, batch)
    assert np.isfinite(float(total))


def test_res2net_config_builds():
    cfg = Config.fromfile("configs/res2net/faster_rcnn_r2_50_fpn_coco.py")
    det = build_detector(dict(cfg.model))
    assert type(det.backbone).__name__ == "Res2Net"


def test_regnet_width_generation_and_forward():
    from dsl_tpu.models.backbones.regnet import (
        ARCH_PARAMS, RegNet, generate_regnet)

    # regnetx_3.2gf published stage layout: widths [96,192,432,1008],
    # depths [2,6,15,2]
    w, d = generate_regnet(**ARCH_PARAMS["regnetx_3.2gf"])
    assert w == [96, 192, 432, 1008]
    assert d == [2, 6, 15, 2]
    bk = RegNet(arch="regnetx_400mf")
    x = jnp.zeros((1, 64, 64, 3))
    v = bk.init(jax.random.PRNGKey(0), x)
    outs = bk.apply(v, x)
    assert len(outs) == 4
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_bfp_preserves_shapes():
    from dsl_tpu.models.necks.bfp import BFP

    feats = tuple(jnp.ones((1, 32 // 2 ** i, 32 // 2 ** i, 16))
                  for i in range(5))
    neck = BFP(in_channels=16, num_levels=5)
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert [o.shape for o in outs] == [f.shape for f in feats]
    # residual added: outputs differ from inputs
    assert float(jnp.abs(outs[0] - feats[0]).sum()) > 0
