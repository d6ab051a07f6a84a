"""Pallas NMS kernel vs the XLA Jacobi implementation (interpret mode on
CPU; the real kernel runs on TPU where `core.nms` selects it)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsl_tpu.core.nms import _greedy_keep
from dsl_tpu.ops.nms_pallas import pallas_nms_keep


def _random_boxes(rng, n):
    c = rng.rand(n, 2) * 100
    wh = rng.rand(n, 2) * 30 + 5
    return np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)


@pytest.mark.parametrize("n", [17, 128, 300])
def test_pallas_matches_jacobi(rng, n):
    boxes = _random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    order = np.argsort(-scores)
    boxes_sorted = jnp.asarray(boxes[order])
    valid = jnp.ones((n,), bool)
    ref = np.asarray(_greedy_keep(boxes_sorted, valid, 0.5))
    got = np.asarray(pallas_nms_keep(boxes_sorted, valid, 0.5,
                                     interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_respects_valid(rng):
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [30, 30, 40, 40]],
                        jnp.float32)
    valid = jnp.asarray([False, True, True])
    got = np.asarray(pallas_nms_keep(boxes, valid, 0.5, interpret=True))
    # box0 invalid -> cannot suppress box1
    np.testing.assert_array_equal(got, [False, True, True])
