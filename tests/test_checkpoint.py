import numpy as np
import jax.numpy as jnp
import pytest

from dsl_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    state = dict(
        params=dict(layer=dict(kernel=jnp.arange(12.0).reshape(3, 4),
                               bias=jnp.ones(4))),
        step=jnp.asarray(7, jnp.int32),
    )
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, meta=dict(epoch=3))
    restored, meta = load_checkpoint(path, state)
    assert meta["epoch"] == 3
    np.testing.assert_allclose(np.asarray(restored["params"]["layer"]["kernel"]),
                               np.arange(12.0).reshape(3, 4))
    assert int(np.asarray(restored["step"])) == 7


def test_checkpoint_trainstate_roundtrip(tmp_path):
    import jax
    from dsl_tpu.train import (build_optimizer_from_cfg, create_train_state)
    from dsl_tpu.models import build_detector
    from tests.test_models import _tiny_model_cfg

    det = build_detector(_tiny_model_cfg())
    variables = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    tx, _ = build_optimizer_from_cfg(
        variables["params"], dict(type="SGD", lr=0.01),
        lr_config=dict(warmup_iters=1), steps_per_epoch=1)
    state = create_train_state(variables, tx, ema_ratio=0.97)
    path = str(tmp_path / "ts")
    save_checkpoint(path, state, meta=dict(epoch=1))
    restored, meta = load_checkpoint(path, state)
    assert float(np.asarray(restored.ema_ratio)) == pytest.approx(0.97)
    k0 = np.asarray(state.params["bbox_head"]["conv_cls"]["kernel"])
    k1 = np.asarray(restored.params["bbox_head"]["conv_cls"]["kernel"])
    np.testing.assert_allclose(k0, k1)
