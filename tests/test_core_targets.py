import numpy as np
import jax.numpy as jnp

from dsl_tpu.core.points import MlvlPointGenerator
from dsl_tpu.core.targets import (
    fcos_targets, expand_point_metadata, centerness_target, ignore_weight, INF,
)

STRIDES = [8, 16, 32, 64, 128]
REGRESS_RANGES = [(-1, 64), (64, 128), (128, 256), (256, 512), (512, INF)]


def _setup(featmap_sizes):
    gen = MlvlPointGenerator(STRIDES)
    points = gen.flat_points(featmap_sizes)
    stride_arr, range_arr = expand_point_metadata(
        featmap_sizes, STRIDES, REGRESS_RANGES)
    return points, stride_arr, range_arr


def test_point_generation():
    gen = MlvlPointGenerator([8])
    pts = np.asarray(gen.single_level_points((2, 3), 8))
    # mmdet formula: x*stride + stride//2
    expect = np.array([[4, 4], [12, 4], [20, 4], [4, 12], [12, 12], [20, 12]],
                      np.float32)
    np.testing.assert_allclose(pts, expect)


def test_fcos_assignment_simple():
    featmap_sizes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    points, strides, ranges = _setup(featmap_sizes)
    # one 40x40 box at origin: max regress distance <= 64 -> level 0 only
    gt = jnp.zeros((1, 3, 4)).at[0, 0].set(jnp.array([0., 0., 40., 40.]))
    labels_in = jnp.zeros((1, 3), jnp.int32).at[0, 0].set(5)
    valid = jnp.zeros((1, 3), bool).at[0, 0].set(True)
    labels, tgt = fcos_targets(points, ranges, strides, gt, labels_in, valid,
                               num_classes=80, center_sampling=False,
                               norm_on_bbox=False)
    labels = np.asarray(labels[0])
    pts = np.asarray(points)
    inside = ((pts[:, 0] > 0) & (pts[:, 0] < 40)
              & (pts[:, 1] > 0) & (pts[:, 1] < 40))
    level0 = np.arange(len(pts)) < 64
    # points inside the box on level 0 whose max-dist is within (-1, 64]
    t = np.stack([pts[:, 0], pts[:, 1], 40 - pts[:, 0], 40 - pts[:, 1]], -1)
    in_range = (t.max(-1) >= -1) & (t.max(-1) <= 64)
    expect_fg = inside & level0 & in_range
    np.testing.assert_array_equal(labels == 5, expect_fg)
    np.testing.assert_array_equal(labels != 80, expect_fg)
    # bbox targets at a known point: (12, 12) -> l=t=12, r=b=28
    i = np.where((pts[:, 0] == 12) & (pts[:, 1] == 12))[0][0]
    np.testing.assert_allclose(np.asarray(tgt[0, i]), [12, 12, 28, 28])


def test_fcos_min_area_tiebreak():
    featmap_sizes = [(4, 4), (1, 1), (1, 1), (1, 1), (1, 1)]
    points, strides, ranges = _setup(featmap_sizes)
    # two nested boxes; inner (smaller) must win where both contain the point
    gt = jnp.array([[[0., 0., 60., 60.], [0., 0., 24., 24.]]])
    labels_in = jnp.array([[1, 2]], jnp.int32)
    valid = jnp.ones((1, 2), bool)
    labels, _ = fcos_targets(points, ranges, strides, gt, labels_in, valid,
                             num_classes=80, center_sampling=False,
                             norm_on_bbox=False)
    pts = np.asarray(points)
    i = np.where((pts[:, 0] == 12) & (pts[:, 1] == 12))[0][0]
    assert int(labels[0, i]) == 2  # smaller box wins


def test_fcos_center_sampling_shrinks_positives():
    featmap_sizes = [(16, 16), (1, 1), (1, 1), (1, 1), (1, 1)]
    points, strides, ranges = _setup(featmap_sizes)
    gt = jnp.array([[[0., 0., 100., 100.]]])
    labels_in = jnp.array([[3]], jnp.int32)
    valid = jnp.ones((1, 1), bool)
    # regress range for level0 is (-1, 64); a 100px box has corner dists >64,
    # so widen via a box fitting level0
    gt = jnp.array([[[20., 20., 80., 80.]]])
    lab_ns, _ = fcos_targets(points, ranges, strides, gt, labels_in, valid,
                             num_classes=80, center_sampling=False,
                             norm_on_bbox=False)
    lab_cs, _ = fcos_targets(points, ranges, strides, gt, labels_in, valid,
                             num_classes=80, center_sampling=True,
                             center_sample_radius=1.5, norm_on_bbox=False)
    n_ns = int((np.asarray(lab_ns[0]) == 3).sum())
    n_cs = int((np.asarray(lab_cs[0]) == 3).sum())
    assert 0 < n_cs < n_ns  # center sampling keeps only center region


def test_fcos_empty_gt_all_background():
    featmap_sizes = [(4, 4), (2, 2), (1, 1), (1, 1), (1, 1)]
    points, strides, ranges = _setup(featmap_sizes)
    gt = jnp.zeros((2, 5, 4))
    labels_in = jnp.zeros((2, 5), jnp.int32)
    valid = jnp.zeros((2, 5), bool)
    labels, tgt = fcos_targets(points, ranges, strides, gt, labels_in, valid,
                               num_classes=80)
    assert np.all(np.asarray(labels) == 80)


def test_norm_on_bbox_divides_by_stride():
    featmap_sizes = [(8, 8), (4, 4), (1, 1), (1, 1), (1, 1)]
    points, strides, ranges = _setup(featmap_sizes)
    gt = jnp.array([[[0., 0., 40., 40.]]])
    labels_in = jnp.array([[0]], jnp.int32)
    valid = jnp.ones((1, 1), bool)
    _, t_raw = fcos_targets(points, ranges, strides, gt, labels_in, valid,
                            num_classes=80, center_sampling=False,
                            norm_on_bbox=False)
    _, t_norm = fcos_targets(points, ranges, strides, gt, labels_in, valid,
                             num_classes=80, center_sampling=False,
                             norm_on_bbox=True)
    np.testing.assert_allclose(np.asarray(t_norm[0, :64]),
                               np.asarray(t_raw[0, :64]) / 8.0, atol=1e-5)


def test_centerness_target():
    t = jnp.array([[10., 10., 10., 10.], [2., 8., 8., 2.]])
    c = np.asarray(centerness_target(t))
    assert abs(c[0] - 1.0) < 1e-6
    assert abs(c[1] - np.sqrt((2 / 8) * (2 / 8))) < 1e-6


def test_ignore_weight():
    nc = 80
    labels = jnp.array([nc, 5, nc, 7])
    ig = jnp.array([nc - 1, nc - 1, nc, nc])
    w = np.asarray(ignore_weight(labels, ig, nc))
    # pt0: ignore-assigned, bg -> 0; pt1: ignore but real fg -> 1
    np.testing.assert_allclose(w, [0.0, 1.0, 1.0, 1.0])
