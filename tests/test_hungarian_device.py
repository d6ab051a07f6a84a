"""Device Hungarian solver == scipy linear_sum_assignment.

The DETR-family matcher now runs entirely on device (lax loops — no
pure_callback, which some TPU runtimes reject and which is a per-step
host sync everywhere). This pins it to scipy on random rectangular
instances: identical assignment on continuous costs, identical optimal
total cost always, and correct handling of zero-valid / padded columns.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from dsl_tpu.core.hungarian import BIG, hungarian_match


def _scipy_assign(cost, n_valid):
    b, q, k = cost.shape
    out = -np.ones((b, q), np.int32)
    for i in range(b):
        n = int(n_valid[i])
        if n:
            rows, cols = linear_sum_assignment(cost[i, :, :n])
            out[i, rows] = cols
    return out


@pytest.mark.parametrize("q,k,seed", [(20, 5, 0), (50, 12, 1), (100, 30, 2),
                                      (16, 16, 3), (40, 1, 4)])
def test_matches_scipy_continuous(q, k, seed):
    rng = np.random.RandomState(seed)
    b = 3
    n_valid = rng.randint(1, k + 1, size=b)
    cost = rng.randn(b, q, k).astype(np.float32) * 4.0
    for i in range(b):                  # padded gt columns carry BIG
        cost[i, :, n_valid[i]:] = BIG
    valid = np.arange(k)[None, :] < n_valid[:, None]

    got = np.asarray(jax.jit(hungarian_match)(
        jnp.asarray(cost), jnp.asarray(valid)))
    want = _scipy_assign(cost, n_valid)
    np.testing.assert_array_equal(got, want)


def test_optimal_on_ties():
    # integer costs with many ties: assignments may differ, the optimal
    # total cost may not
    rng = np.random.RandomState(7)
    b, q, k = 4, 30, 10
    cost = rng.randint(0, 4, size=(b, q, k)).astype(np.float32)
    valid = np.ones((b, k), bool)
    got = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(valid)))
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        want_total = cost[i][rows, cols].sum()
        gr = np.where(got[i] >= 0)[0]
        assert len(gr) == k
        assert sorted(got[i][gr].tolist()) == list(range(k))
        got_total = cost[i][gr, got[i][gr]].sum()
        np.testing.assert_allclose(got_total, want_total, rtol=1e-6)


def test_zero_valid_and_grad_safety():
    cost = jnp.asarray(np.random.RandomState(0).rand(2, 8, 3),
                       jnp.float32)
    valid = jnp.zeros((2, 3), bool)
    got = np.asarray(hungarian_match(cost, valid))
    assert (got == -1).all()
