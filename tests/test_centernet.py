"""CenterNet tier: deform conv op, gaussian targets, loss, decode, e2e."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models import build_detector
from dsl_tpu.models.dense_heads.centernet_head import (
    centernet_get_bboxes, centernet_loss, centernet_targets, gaussian_radius)
from dsl_tpu.ops.deform_conv import deform_conv2d, sample_points


CFG = dict(
    type="CenterNet",
    backbone=dict(type="ResNet", depth=18, out_indices=(3,)),
    neck=dict(type="CTResNetNeck", in_channel=512,
              num_deconv_filters=(64, 32, 32),
              num_deconv_kernels=(4, 4, 4), use_dcn=True),
    bbox_head=dict(type="CenterNetHead", num_classes=4, in_channels=32,
                   feat_channels=32),
    test_cfg=dict(score_thr=0.05, max_per_img=20))


# -- deform conv ---------------------------------------------------------


def test_deform_conv_zero_offsets_equals_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 5), jnp.float32)
    offsets = jnp.zeros((1, 8, 8, 18))
    out = deform_conv2d(x, offsets, w)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_shift_offsets():
    """A uniform (0, +1) offset equals convolving the x-shifted image."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 2), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 2, 2), jnp.float32)
    off = jnp.zeros((1, 8, 8, 18)).at[..., 1::2].set(1.0)   # dx = +1
    out = deform_conv2d(x, off, w)
    x_shift = jnp.concatenate([x[:, :, 1:], jnp.zeros((1, 8, 1, 2))], axis=2)
    ref = jax.lax.conv_general_dilated(
        x_shift, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # interior only (borders differ: zero-pad vs out-of-bounds-zero sampling)
    np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-2],
                               np.asarray(ref)[:, 1:-1, 1:-2],
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_mask_scales():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 6, 2), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 2, 2), jnp.float32)
    off = jnp.zeros((1, 6, 6, 18))
    half = deform_conv2d(x, off, w, mask=jnp.full((1, 6, 6, 9), 0.5))
    full = deform_conv2d(x, off, w, mask=jnp.ones((1, 6, 6, 9)))
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5,
                               rtol=1e-4, atol=1e-5)


def test_sample_points_identity():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 5, 5, 3), jnp.float32)
    ys = jnp.broadcast_to(jnp.arange(5.0)[None, :, None, None], (1, 5, 5, 1))
    xs = jnp.broadcast_to(jnp.arange(5.0)[None, None, :, None], (1, 5, 5, 1))
    out = sample_points(x, ys, xs)[..., 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


# -- gaussian radius / targets -------------------------------------------


def test_gaussian_radius_matches_reference_formula():
    """Check against mmdet gaussian_target.py computed by hand for h=w=10,
    min_overlap=0.3."""
    import math

    h = w = 10.0
    r1 = ((h + w) - math.sqrt((h + w) ** 2 - 4 * (w * h * 0.7 / 1.3))) / 2
    b2 = 2 * (h + w)
    r2 = (b2 - math.sqrt(b2 ** 2 - 16 * (0.7 * w * h))) / 8
    a3, b3, c3 = 4 * 0.3, -2 * 0.3 * (h + w), (0.3 - 1) * w * h
    r3 = (-b3 + math.sqrt(b3 * b3 - 4 * a3 * c3)) / (2 * a3)
    expected = min(r1, r2, r3)
    got = float(gaussian_radius(jnp.asarray(h), jnp.asarray(w)))
    assert abs(got - expected) < 1e-4


def test_centernet_targets_peak_and_offsets():
    from dsl_tpu.models.dense_heads.centernet_head import CenterNetHead

    head = CenterNetHead(num_classes=3)
    gt = jnp.asarray([[[8.0, 8.0, 56.0, 40.0], [0.0] * 4]])
    labels = jnp.asarray([[2, 0]])
    valid = jnp.asarray([[True, False]])
    heat, wh, off, wgt, avg = centernet_targets(
        head, gt, labels, valid, feat_hw=(16, 16), img_hw=(64, 64))
    # center (32, 24) img coords -> (8, 6) feat coords
    assert float(heat[0, 6, 8, 2]) == 1.0       # peak at int center, class 2
    assert float(heat.sum()) > 1.0              # gaussian spread
    assert float(heat[0, :, :, 0].max()) == 0.0  # no peak for other classes
    np.testing.assert_allclose(np.asarray(wh[0, 6, 8]), [12.0, 8.0],
                               atol=1e-5)      # scaled w, h
    assert float(wgt[0, 6, 8, 0]) == 1.0
    assert float(wgt.sum()) == 1.0              # only the one valid gt
    assert float(avg) == 1.0


# -- loss / decode / e2e ---------------------------------------------------


def _batch(b=1, size=64, k=4):
    gt = np.zeros((b, k, 4), np.float32)
    gt[:, 0] = [8, 8, 56, 40]
    valid = np.zeros((b, k), bool)
    valid[:, 0] = True
    return dict(
        images=jnp.asarray(np.random.RandomState(0).rand(b, size, size, 3),
                           jnp.float32),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, k), jnp.int32),
        gt_valid=jnp.asarray(valid),
        ignore_bboxes=jnp.zeros((b, 2, 4), jnp.float32),
        ignore_valid=jnp.zeros((b, 2), bool),
    )


def test_centernet_detector_loss_and_predict():
    from dsl_tpu.models.detectors.single_stage import (
        detector_loss, detector_predict)

    det = build_detector(CFG)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    total, logs = jax.jit(
        lambda v, b: detector_loss(det, v, b))(variables, _batch())
    assert np.isfinite(float(total))
    assert {"loss_center_heatmap", "loss_wh", "loss_offset"} <= set(logs)
    # gradient reaches the DCN offsets conv
    g = jax.grad(lambda v: detector_loss(det, v, _batch())[0])(variables)
    gk = g["params"]["neck"]["dcn0"]["kernel"]
    assert float(jnp.abs(gk).sum()) > 0

    dets, labels, valid = jax.jit(
        lambda v, im: detector_predict(
            det, v, im, img_shapes=jnp.asarray([[64.0, 64.0]]),
            scale_factors=jnp.ones((1, 4))))(variables, _batch()["images"])
    assert dets.shape[2] == 5 and labels.shape == valid.shape


def test_centernet_decode_planted_peak():
    """Plant a synthetic heatmap peak; decode must recover the box."""
    from dsl_tpu.models.dense_heads.centernet_head import CenterNetHead

    head = CenterNetHead(num_classes=3)
    fh = fw = 16
    heat = jnp.full((1, fh, fw, 3), -10.0).at[0, 4, 6, 1].set(10.0)
    wh = jnp.zeros((1, fh, fw, 2)).at[0, 4, 6].set(jnp.asarray([8.0, 6.0]))
    off = jnp.zeros((1, fh, fw, 2)).at[0, 4, 6].set(
        jnp.asarray([0.25, 0.5]))
    dets, cls, valid = centernet_get_bboxes(
        head, (heat, wh, off),
        img_shapes=jnp.asarray([[64.0, 64.0]]),
        scale_factors=jnp.ones((1, 4)), max_per_img=5)
    assert bool(valid[0, 0])
    assert int(cls[0, 0]) == 1
    # center (6.25, 4.5) * stride 4 = (25, 18); w=8*4=32, h=6*4=24
    np.testing.assert_allclose(
        np.asarray(dets[0, 0, :4]), [25 - 16, 18 - 12, 25 + 16, 18 + 12],
        atol=1e-4)
    # 3x3 local-max suppression: neighbours of the peak don't fire
    assert not bool(valid[0, 1])
