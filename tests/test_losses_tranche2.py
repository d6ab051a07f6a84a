"""Zoo tranche-2 losses vs the reference's own golden values
(``/root/reference/tests/test_metrics/test_losses.py``) + analytic checks."""

import numpy as np
import jax.numpy as jnp

from dsl_tpu.core.losses import (
    balanced_l1_loss, gaussian_focal_loss, ghm_c_loss, ghm_r_loss,
    kd_kl_div_loss, seesaw_ce_loss, seesaw_loss, varifocal_loss)


# -- Varifocal (reference test_varifocal_loss goldens) -----------------------


def test_varifocal_goldens():
    pred = jnp.asarray([[100.0, -100.0]])
    target = jnp.asarray([[1.0, 0.0]])
    assert abs(float(varifocal_loss(pred, target))) < 1e-6

    pred = jnp.asarray([[0.0, 100.0]])
    target = jnp.asarray([[1.0, 1.0]])
    w = jnp.asarray([[0.0, 1.0]])
    assert abs(float(varifocal_loss(pred, target, weight=w))) < 1e-6

    # positive at logit 0: loss = target * BCE = 1 * log 2 (mean over 1 elem)
    pred = jnp.asarray([[0.0]])
    target = jnp.asarray([[1.0]])
    assert abs(float(varifocal_loss(pred, target)) - np.log(2)) < 1e-6


# -- KD KL-div (reference test_kd_loss goldens) -------------------------------


def test_kd_goldens():
    pred = jnp.asarray([[100.0, 100.0]])
    target = jnp.asarray([[1.0, 1.0]])
    assert abs(float(kd_kl_div_loss(pred, target, T=1))) < 1e-6

    pred = jnp.asarray([[100.0, -100.0], [100.0, 100.0]])
    target = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    w = jnp.asarray([0.0, 1.0])
    assert abs(float(kd_kl_div_loss(pred, target, T=1, weight=w))) < 1e-6


# -- Seesaw (reference test_seesaw_loss goldens) ------------------------------


def test_seesaw_golden_no_pq():
    pred = jnp.asarray([[-100.0, 100.0, -100.0, 100.0]])
    labels = jnp.asarray([1])
    cum = jnp.zeros((3,))
    lc, lo, _ = seesaw_loss(pred, labels, cum, num_classes=2, p=0.0, q=0.0)
    assert abs(float(lo) - 200.0) < 1e-3
    assert abs(float(lc)) < 1e-6


def test_seesaw_golden_p_only():
    pred = jnp.asarray([[-100.0, 100.0, -100.0, 100.0]])
    labels = jnp.asarray([0])
    cum = jnp.zeros((3,)).at[0].set(float(np.exp(20.0)))
    lc, lo, new_cum = seesaw_loss(pred, labels, cum, num_classes=2,
                                  p=1.0, q=0.0)
    assert abs(float(lo) - 200.0) < 1e-3
    assert abs(float(lc) - 180.0) < 1e-2
    # counts accumulate (checked on a fresh counter; adding 1 to e^20 is a
    # float32 no-op)
    _, _, fresh = seesaw_loss(pred, labels, jnp.zeros((3,)), num_classes=2,
                              p=0.0, q=0.0)
    assert float(fresh[0]) == 1.0


def test_seesaw_golden_q_only():
    pred = jnp.asarray([[-100.0, 100.0, -100.0, 100.0]])
    labels = jnp.asarray([0])
    cum = jnp.zeros((3,))
    lc, lo, _ = seesaw_loss(pred, labels, cum, num_classes=2, p=0.0, q=1.0)
    assert abs(float(lo) - 200.0) < 1e-3
    assert abs(float(lc) - (200.0 + np.log(100.0))) < 1e-2


def test_seesaw_perfect_prediction_zero():
    pred = jnp.asarray([[100.0, -100.0, 100.0, -100.0]])
    labels = jnp.asarray([0])
    lc, lo, _ = seesaw_loss(pred, labels, jnp.zeros((3,)), num_classes=2,
                            p=0.0, q=1.0)
    assert abs(float(lc)) < 1e-6 and abs(float(lo)) < 1e-6


# -- GHM ----------------------------------------------------------------------


def test_ghm_c_single_bin_equals_mean_bce():
    """All gradients in one bin → weights cancel to plain mean BCE."""
    logits = jnp.zeros((4, 3))
    targets = jnp.zeros((4, 3))
    lw = jnp.ones((4, 3))
    loss = float(ghm_c_loss(logits, targets, lw))
    assert abs(loss - np.log(2.0)) < 1e-6


def test_ghm_c_rare_bin_upweighted():
    """A lone hard example (big gradient) gets a larger weight than each of
    many easy ones — the GHM property."""
    logits = jnp.asarray([[-10.0], [-10.0], [-10.0], [10.0]])
    targets = jnp.asarray([[0.0], [0.0], [0.0], [1.0]])   # all 'correct'...
    hard = jnp.asarray([[-10.0], [-10.0], [-10.0], [-10.0]])
    t2 = jnp.asarray([[0.0], [0.0], [0.0], [1.0]])        # last one hard
    lw = jnp.ones((4, 1))
    easy_loss = float(ghm_c_loss(logits, targets, lw))
    hard_loss = float(ghm_c_loss(hard, t2, lw))
    assert hard_loss > easy_loss


def test_ghm_c_momentum_returns_state():
    logits = jnp.zeros((4, 1))
    targets = jnp.zeros((4, 1))
    lw = jnp.ones((4, 1))
    acc0 = jnp.zeros((10,))
    loss, acc1 = ghm_c_loss(logits, targets, lw, momentum=0.5, acc_sum=acc0)
    assert np.isfinite(float(loss))
    # bin of g=0.5 got (1-m)*4 = 2
    assert abs(float(acc1[5]) - 2.0) < 1e-6
    assert float(acc1.sum()) == 2.0


def test_ghm_r_zero_at_perfect():
    pred = jnp.asarray([[1.0, 2.0]])
    lw = jnp.ones((1, 2))
    assert abs(float(ghm_r_loss(pred, pred, lw))) < 1e-7
    loss = float(ghm_r_loss(pred, pred + 1.0, lw))
    assert loss > 0.5      # ASL1 ~ |d| - mu for large d


# -- GaussianFocal / BalancedL1 ----------------------------------------------


def test_gaussian_focal_analytic():
    # peak prediction at peak target -> ~0; at 0.5 -> -log(.5)*(.5)^2
    pred = jnp.asarray([0.5])
    tgt = jnp.asarray([1.0])
    expected = -np.log(0.5) * 0.25
    assert abs(float(gaussian_focal_loss(pred, tgt)) - expected) < 1e-6
    # pure background with confident 0 prediction -> ~0
    assert float(gaussian_focal_loss(jnp.asarray([1e-9]),
                                     jnp.asarray([0.0]))) < 1e-6


def test_balanced_l1_continuity_and_zero():
    assert float(balanced_l1_loss(jnp.asarray([3.0]), jnp.asarray([3.0]))) \
        == 0.0
    beta = 1.0
    lo = float(balanced_l1_loss(jnp.asarray([beta - 1e-5]),
                                jnp.asarray([0.0])))
    hi = float(balanced_l1_loss(jnp.asarray([beta + 1e-5]),
                                jnp.asarray([0.0])))
    assert abs(lo - hi) < 1e-3     # continuous at the beta knee
    # balanced L1 <= plain L1 + const near 0 but grows ~gamma*d for large d
    big = float(balanced_l1_loss(jnp.asarray([100.0]), jnp.asarray([0.0])))
    assert abs(big - (1.5 * 100.0 + 1.5 / (np.e ** 3 - 1) - 0.5)) < 1e-3


def test_seesaw_ce_matches_plain_ce_when_disabled():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(6, 5), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, 6))
    from dsl_tpu.core.losses import cross_entropy

    a = float(seesaw_ce_loss(logits, labels, jnp.ones((5,)), p=0.0, q=0.0))
    b = float(cross_entropy(logits, labels))
    assert abs(a - b) < 1e-5
