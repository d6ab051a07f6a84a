"""NASFCOS head/FPN + FPG: shape tests + NASFCOS e2e forward."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_loss, detector_predict)
from dsl_tpu.models.necks.nasfcos_fpn import FPG, NASFCOS_FPN


def _feats(chs=(32, 64, 128), base=16):
    return [jnp.zeros((1, base // (2 ** i), base // (2 ** i), c))
            for i, c in enumerate(chs)]


def test_nasfcos_fpn_shapes():
    neck = NASFCOS_FPN(in_channels=[32, 64, 128], out_channels=16,
                       num_outs=5)
    feats = _feats()
    variables = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(variables, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 16)
    assert outs[3].shape == (1, 2, 2, 16)


def test_fpg_shapes():
    neck = FPG(in_channels=[32, 64, 128], out_channels=16, num_outs=5,
               stack_times=2)
    feats = _feats()
    variables = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(variables, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 16)


def test_nasfcos_head_e2e():
    cfg = dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
        neck=dict(type="NASFCOS_FPN", in_channels=[128, 256, 512],
                  out_channels=32, num_outs=5),
        bbox_head=dict(type="NASFCOSHead", num_classes=4, in_channels=32,
                       feat_channels=32),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=10))
    det = build_detector(cfg)
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
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
        source_weights=jnp.ones((b,), jnp.float32),
    )
    variables = det.init(jax.random.PRNGKey(0), batch["images"])
    total, logs = jax.jit(lambda v, bb: detector_loss(det, v, bb))(
        variables, batch)
    assert np.isfinite(float(total)), logs
    dets, labels, vmask = jax.jit(lambda v, im: detector_predict(
        det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]] * b),
        scale_factors=jnp.ones((b, 4))))(variables, batch["images"])
    assert dets.shape == (b, 10, 5)


def test_fpn_bilinear_upsample_cfg_matches_torch_interpolate():
    """FPN ``upsample_cfg=dict(mode='bilinear')`` (YOLACT's neck config,
    ``configs/yolact/yolact_r50_1x8_coco.py:25``) — the top-down upsample
    must match ``F.interpolate(..., mode='bilinear')`` (align_corners=False,
    mmdet ``fpn.py:119-124``), which jax.image.resize('bilinear')
    reproduces (both use half-pixel centers)."""
    import numpy as np
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    from dsl_tpu.models.necks.fpn import _upsample

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(_upsample(jnp.asarray(x), (10, 14),
                                dict(mode="bilinear")))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(10, 14), mode="bilinear",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, ref, atol=1e-5)
    # nearest stays the default and unchanged
    near = np.asarray(_upsample(jnp.asarray(x), (10, 14), None))
    assert near.shape == (2, 10, 14, 3)
