import numpy as np
import jax.numpy as jnp
import pytest

from dsl_tpu.ops.roi_align import roi_align, roi_pool


def test_roi_align_constant_field():
    # constant features: every output value equals the constant
    feats = jnp.full((1, 16, 16, 3), 5.0)
    rois = jnp.asarray([[0, 2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feats, rois, out_size=(7, 7), spatial_scale=1.0)
    assert out.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_linear_ramp():
    # features = x coordinate: sampled mean of each bin ≈ bin center x
    h = w = 32
    xs = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    feats = jnp.asarray(xs[None, :, :, None])
    rois = jnp.asarray([[0, 4.0, 4.0, 20.0, 20.0]])
    out = np.asarray(roi_align(feats, rois, out_size=(4, 4),
                               spatial_scale=1.0, sampling_ratio=2))[0, :, :, 0]
    # aligned=True: sample centers at x1-0.5 + (j+0.5)*bin
    bin_w = 16.0 / 4
    expect = (4.0 - 0.5) + (np.arange(4) + 0.5) * bin_w
    np.testing.assert_allclose(out[0], expect, atol=1e-4)
    # rows identical (field depends only on x)
    np.testing.assert_allclose(out[0], out[3], atol=1e-5)


def test_roi_align_batch_index_and_valid():
    feats = jnp.stack([jnp.full((8, 8, 1), 1.0), jnp.full((8, 8, 1), 2.0)])
    rois = jnp.asarray([[0, 0, 0, 8, 8], [1, 0, 0, 8, 8], [0, 0, 0, 8, 8]])
    valid = jnp.asarray([True, True, False])
    out = np.asarray(roi_align(feats, rois, out_size=(2, 2), valid=valid))
    np.testing.assert_allclose(out[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[1], 2.0, atol=1e-5)
    np.testing.assert_allclose(out[2], 0.0)


def test_roi_align_spatial_scale():
    # stride-4 feature map: roi in image coords scaled by 0.25
    h = w = 8
    xs = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    feats = jnp.asarray(xs[None, :, :, None])
    rois = jnp.asarray([[0, 8.0, 8.0, 24.0, 24.0]])   # -> feature 2..6
    out = np.asarray(roi_align(feats, rois, out_size=(2, 2),
                               spatial_scale=0.25, sampling_ratio=2))
    assert 1.0 < out[0, 0, 0, 0] < out[0, 0, 1, 0] < 6.0


def test_roi_pool_max():
    feats = np.zeros((1, 8, 8, 1), np.float32)
    feats[0, 3, 3, 0] = 9.0
    out = np.asarray(roi_pool(jnp.asarray(feats),
                              jnp.asarray([[0, 0, 0, 8, 8]]),
                              out_size=(2, 2)))
    assert out.max() == pytest.approx(9.0, abs=1.0)  # bilinear max approx
    assert out[0, 0, 0, 0] > out[0, 1, 1, 0]
