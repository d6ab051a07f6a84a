import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.core.losses import (
    sigmoid_focal_loss, binary_cross_entropy, cross_entropy, giou_loss,
    iou_loss, smooth_l1_loss, l1_loss, weight_reduce_loss,
)


def _np_focal(logits, onehot, gamma=2.0, alpha=0.25):
    p = 1 / (1 + np.exp(-logits))
    ce = -(onehot * np.log(p + 1e-12) + (1 - onehot) * np.log(1 - p + 1e-12))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    a_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return a_t * (1 - p_t) ** gamma * ce


def test_focal_matches_numpy(rng):
    logits = rng.randn(6, 4).astype(np.float32)
    targets = rng.randint(0, 5, size=(6,))  # 4 = background
    onehot = np.eye(5)[:, :4][targets]
    expect = _np_focal(logits, onehot).sum() / 3.0
    got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   avg_factor=3.0))
    assert abs(got - expect) < 1e-4


def test_focal_weight_per_sample(rng):
    logits = rng.randn(4, 3).astype(np.float32)
    targets = np.array([0, 1, 3, 2])
    w = np.array([1.0, 0.0, 2.0, 1.0], np.float32)
    onehot = np.eye(4)[:, :3][targets]
    expect = (_np_focal(logits, onehot) * w[:, None]).sum() / 2.0
    got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   weight=jnp.asarray(w), avg_factor=2.0))
    assert abs(got - expect) < 1e-4


def test_bce_matches_numpy(rng):
    logits = rng.randn(8).astype(np.float32)
    targets = rng.rand(8).astype(np.float32)
    p = 1 / (1 + np.exp(-logits))
    expect = -(targets * np.log(p) + (1 - targets) * np.log(1 - p)).mean()
    got = float(binary_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(got - expect) < 1e-4


def test_cross_entropy(rng):
    logits = rng.randn(5, 7).astype(np.float32)
    targets = rng.randint(0, 7, size=(5,))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    expect = -np.log(p[np.arange(5), targets]).mean()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(got - expect) < 1e-4


def test_giou_loss_perfect_box_zero():
    b = jnp.array([[0., 0., 10., 10.]])
    assert float(giou_loss(b, b)) < 1e-5
    assert float(iou_loss(b, b)) < 1e-5


def test_giou_loss_disjoint():
    p = jnp.array([[0., 0., 10., 10.]])
    t = jnp.array([[20., 0., 30., 10.]])
    # giou = -(300-200)/300 -> loss = 1 + 1/3
    assert abs(float(giou_loss(p, t)) - (1 + 100.0 / 300.0)) < 1e-4


def test_smooth_l1_and_l1():
    p = jnp.array([0.0, 2.0])
    t = jnp.array([0.5, 0.0])
    sl = float(smooth_l1_loss(p, t, beta=1.0, reduction="sum"))
    assert abs(sl - (0.5 * 0.25 + 1.5)) < 1e-6
    assert abs(float(l1_loss(p, t, reduction="sum")) - 2.5) < 1e-6


def test_weight_reduce_none_sum():
    loss = jnp.array([1.0, 2.0, 3.0])
    w = jnp.array([1.0, 0.0, 1.0])
    assert np.allclose(np.asarray(weight_reduce_loss(loss, w, "none")),
                       [1, 0, 3])
    assert float(weight_reduce_loss(loss, w, "sum")) == 4.0


def test_losses_grad_finite(rng):
    logits = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 5, size=(10,)))

    g = jax.grad(lambda x: sigmoid_focal_loss(x, targets, avg_factor=5.0))(
        logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_accuracy_topk_golden():
    """Pinned to the reference's unit test
    (``tests/test_metrics/test_losses.py`` accuracy cases)."""
    from dsl_tpu.core.losses import accuracy

    pred = jnp.asarray([[0.2, 0.3, 0.6, 0.2, 0.1],
                        [0.1, 0.1, 0.2, 0.6, 0.1],
                        [0.9, 0.0, 0.0, 0.1, 0.0],
                        [0.4, 0.7, 0.1, 0.1, 0.3]])
    target = jnp.asarray([2, 3, 0, 1])
    assert float(accuracy(pred, target, topk=1)) == 100.0
    # thresh above every score -> zero accuracy
    assert float(accuracy(pred, target, topk=1, thresh=1.0)) == 0.0
    t2 = jnp.asarray([1, 2, 1, 3])     # every target is the 2nd/3rd choice?
    a1 = float(accuracy(pred, t2, topk=1))
    a1_2 = accuracy(pred, t2, topk=(1, 2))
    assert a1 == float(a1_2[0]) and float(a1_2[1]) >= a1
