"""LR policies (cosine/poly) and AdamW optimizer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.train.optim import (build_lr_schedule, build_optimizer_from_cfg,
                                 make_adamw)


def test_cosine_annealing_schedule():
    s = build_lr_schedule(0.1, warmup_iters=0, policy="CosineAnnealing",
                          total_iters=100, min_lr_ratio=0.1)
    assert np.isclose(float(s(0)), 0.1)
    assert np.isclose(float(s(50)), 0.1 * (0.1 + 0.9 * 0.5), rtol=1e-5)
    assert np.isclose(float(s(100)), 0.01, rtol=1e-5)


def test_poly_schedule_and_warmup():
    s = build_lr_schedule(0.2, warmup_iters=10, warmup_ratio=0.5,
                          policy="poly", total_iters=100, power=2.0)
    assert np.isclose(float(s(0)), 0.1)              # warmup start
    assert float(s(5)) < float(s(10))                # warming up
    assert np.isclose(float(s(50)), 0.2 * 0.25, rtol=1e-4)  # (1-0.5)^2


def test_adamw_custom_lr_mults_and_decay():
    params = {"backbone": {"w": jnp.ones((4,))},
              "head": {"w": jnp.ones((4,))}}
    opt = make_adamw(params, lambda step: 0.0001,
                     custom_lr_mults={"backbone": 0.1},
                     weight_decay=0.0)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    # backbone step is 10x smaller
    assert np.isclose(float(updates["backbone"]["w"][0]),
                      0.1 * float(updates["head"]["w"][0]), rtol=1e-5)
    # pure decoupled decay shrinks params even with zero grad
    opt2 = make_adamw(params, lambda step: 0.01, weight_decay=0.1)
    st2 = opt2.init(params)
    zg = jax.tree_util.tree_map(jnp.zeros_like, params)
    up2, _ = opt2.update(zg, st2, params)
    assert float(up2["head"]["w"][0]) < 0           # -lr*wd*p


def test_build_optimizer_adamw_from_detr_style_cfg():
    params = {"backbone": {"w": jnp.ones((2,))},
              "bbox_head": {"w": jnp.ones((2,))}}
    opt, sched = build_optimizer_from_cfg(
        params,
        optimizer_cfg=dict(type="AdamW", lr=1e-4, weight_decay=1e-4,
                           paramwise_cfg=dict(custom_keys=dict(
                               backbone=dict(lr_mult=0.1)))),
        optimizer_config=dict(grad_clip=dict(max_norm=0.1)),
        lr_config=dict(policy="step", step=[40], warmup_iters=0),
        steps_per_epoch=10)
    state = opt.init(params)
    big = jax.tree_util.tree_map(lambda p: 100.0 * jnp.ones_like(p), params)
    updates, state = opt.update(big, state, params)
    assert np.isfinite(float(updates["bbox_head"]["w"][0]))
    # minimizes a quadratic
    p = {"head": {"w": jnp.asarray([3.0])}}
    opt3, _ = build_optimizer_from_cfg(
        p, optimizer_cfg=dict(type="AdamW", lr=0.1, weight_decay=0.0),
        lr_config=dict(warmup_iters=0))
    st = opt3.init(p)
    for _ in range(200):
        g = jax.tree_util.tree_map(lambda x: 2 * x, p)
        up, st = opt3.update(g, st, p)
        p = jax.tree_util.tree_map(lambda x, u: x + u, p, up)
    assert abs(float(p["head"]["w"][0])) < 0.2


def test_cyclic_momentum_schedule_and_sgd_wiring():
    from dsl_tpu.train.optim import build_momentum_schedule
    m = build_momentum_schedule(0.95, total_iters=100)
    assert np.isclose(float(m(0)), 0.95)             # base at start
    assert np.isclose(float(m(40)), 0.85, rtol=1e-4)  # trough at 40%
    assert np.isclose(float(m(100)), 0.95, rtol=1e-4)  # back to base
    assert float(m(20)) < float(m(0))                # inverse to cyclic LR
    # mid-phase value: mmcv default anneal 'cos' — at 20% (halfway down the
    # up-phase) ratio = annealing_cos(1, 0.85/0.95, 0.5) = mid of the two
    mid = 0.95 * (0.85 / 0.95 + 0.5 * (1 - 0.85 / 0.95))
    assert np.isclose(float(m(20)), mid, rtol=1e-5)
    # linear strategy is also exposed (mmcv annealing_linear)
    ml = build_momentum_schedule(0.95, total_iters=100,
                                 anneal_strategy="linear")
    assert np.isclose(float(ml(20)), 0.95 + (0.85 - 0.95) * 0.5, rtol=1e-5)
    # momentum_config with Adam/AdamW must reject loudly (mmcv updates
    # beta1; we don't wire that)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        build_optimizer_from_cfg(
            {"w": jnp.asarray([1.0])},
            optimizer_cfg=dict(type="AdamW", lr=1e-4),
            steps_per_epoch=10, total_epochs=10,
            momentum_config=dict(policy="cyclic"))

    # momentum_config threads through build_optimizer_from_cfg: the SGD
    # momentum buffer at step 2 uses the scheduled mu(1), not the scalar
    params = {"head": {"w": jnp.asarray([1.0])}}
    opt, _ = build_optimizer_from_cfg(
        params, optimizer_cfg=dict(type="SGD", lr=1.0, momentum=0.95,
                                   weight_decay=0.0),
        lr_config=dict(policy="cyclic", warmup_iters=0),
        steps_per_epoch=10, total_epochs=10,
        momentum_config=dict(policy="cyclic"))
    st = opt.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    _, st = opt.update(g, st, params)
    up, st = opt.update(g, st, params)
    mu1 = float(build_momentum_schedule(0.95, total_iters=100)(1))
    assert np.isclose(float(st.momentum["head"]["w"][0]), mu1 * 1.0 + 1.0,
                      rtol=1e-6)


def test_cyclic_schedule():
    s = build_lr_schedule(0.01, warmup_iters=0, policy="cyclic",
                          total_iters=100)
    assert np.isclose(float(s(0)), 0.01)            # start at base
    assert np.isclose(float(s(40)), 0.1, rtol=1e-3)  # 10x peak at 40%
    assert float(s(100)) < 1e-4                      # decayed to ~1e-4x
    assert float(s(20)) > float(s(0))                # ramping up
    assert float(s(80)) < float(s(40))               # ramping down


def test_zero_init_residual_blocks_start_as_identity():
    """mmdet ResNet init_weights ``zero_init_residual`` (default True;
    scratch configs set False): the last norm of every residual block is
    zero-init so each block starts as relu(identity)."""
    import jax
    import jax.numpy as jnp
    from dsl_tpu.models.backbones.resnet import ResNet

    x = jnp.ones((1, 32, 32, 3))
    v = ResNet(depth=50, num_stages=2, out_indices=(0, 1),
               strides=(1, 2)).init(jax.random.PRNGKey(0), x)
    p = v["params"]
    assert float(jnp.abs(p["layer1_0"]["bn3"]["scale"]).max()) == 0.0
    assert float(jnp.abs(p["layer1_0"]["bn1"]["scale"]).min()) == 1.0
    v2 = ResNet(depth=50, num_stages=2, out_indices=(0, 1), strides=(1, 2),
                zero_init_residual=False).init(jax.random.PRNGKey(0), x)
    assert float(jnp.abs(v2["params"]["layer1_0"]["bn3"]["scale"]).min()) == 1.0
