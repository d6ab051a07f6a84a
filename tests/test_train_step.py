import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models import build_detector
from dsl_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from dsl_tpu.train import (
    build_lr_schedule, build_optimizer_from_cfg, create_train_state,
    frozen_backbone_mask, jit_train_step, make_train_step,
)

from tests.test_models import _tiny_model_cfg


def _make_batch(b=8, size=64, k=2):
    rng = np.random.RandomState(0)
    return dict(
        images=jnp.asarray(rng.rand(b, size, size, 3), jnp.float32),
        gt_bboxes=jnp.tile(jnp.asarray([[4., 4., 40., 40.], [0, 0, 0, 0]]),
                           (b, 1, 1)),
        gt_labels=jnp.zeros((b, k), jnp.int32),
        gt_valid=jnp.tile(jnp.asarray([True, False]), (b, 1)),
        ignore_bboxes=jnp.zeros((b, 1, 4)),
        ignore_valid=jnp.zeros((b, 1), bool),
        source_weight=jnp.ones((b,)),
    )


def _setup(b=8):
    det = build_detector(_tiny_model_cfg())
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    frozen = frozen_backbone_mask(variables["params"], frozen_stages=1)
    tx, sched = build_optimizer_from_cfg(
        variables["params"],
        dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=1e-4,
             paramwise_cfg=dict(bias_lr_mult=2.0, bias_decay_mult=0.0)),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(warmup="linear", warmup_iters=10,
                       warmup_ratio=1.0 / 3, step=[20, 26]),
        steps_per_epoch=100, frozen_mask=frozen)
    state = create_train_state(variables, tx, ema_ratio=0.9)
    step = make_train_step(det, tx, ema_interval=1,
                           ema_start_iter=1)
    return det, state, step


def test_train_step_runs_on_8_device_mesh():
    assert jax.device_count() >= 8
    mesh = make_mesh()
    det, state, step = _setup()
    jstep = jit_train_step(step, mesh)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, _make_batch(8))
    state2, metrics = jstep(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # teacher must have moved toward student after EMA
    t0 = jax.tree_util.tree_leaves(state.teacher_params)[0]
    # run a second step; student params must change
    state3, _ = jstep(state2, batch)
    assert int(state3.step) == 2


def test_param_updates_and_frozen_mask():
    det, state, step = _setup()
    batch = _make_batch(2)
    state2, metrics = jax.jit(step)(state, batch)
    p0 = state.params
    p2 = state2.params
    # frozen stem of backbone unchanged
    stem0 = p0["backbone"]["conv1"]["kernel"]
    stem2 = p2["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(stem0), np.asarray(stem2))
    # layer2+ must change
    moved = p2["backbone"]["layer2_0"]["conv1"]["kernel"]
    orig = p0["backbone"]["layer2_0"]["conv1"]["kernel"]
    assert float(jnp.abs(moved - orig).sum()) > 0
    # head changes
    h2 = p2["bbox_head"]["conv_cls"]["kernel"]
    h0 = p0["bbox_head"]["conv_cls"]["kernel"]
    assert float(jnp.abs(h2 - h0).sum()) > 0


def test_ema_blend_math():
    det, state, step = _setup()
    batch = _make_batch(2)
    state2, _ = jax.jit(step)(state, batch)
    # teacher = 0.9*teacher0 + 0.1*student_new; teacher0 == params0
    t2 = state2.teacher_params["bbox_head"]["conv_cls"]["kernel"]
    expect = (0.9 * state.params["bbox_head"]["conv_cls"]["kernel"]
              + 0.1 * state2.params["bbox_head"]["conv_cls"]["kernel"])
    np.testing.assert_allclose(np.asarray(t2), np.asarray(expect), atol=1e-6)


def test_lr_schedule_warmup_and_steps():
    sched = build_lr_schedule(0.01, warmup_iters=500, warmup_ratio=1 / 3,
                              step_epochs=[20, 26], steps_per_epoch=1000)
    assert abs(float(sched(0)) - 0.01 / 3) < 1e-6
    assert abs(float(sched(500)) - 0.01) < 1e-7
    assert abs(float(sched(19_999)) - 0.01) < 1e-7
    assert abs(float(sched(20_000)) - 0.001) < 1e-8
    assert abs(float(sched(26_000)) - 0.0001) < 1e-9
