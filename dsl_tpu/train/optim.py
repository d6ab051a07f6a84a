"""Optimizer + LR schedule from config, torch-SGD semantics, frozen masks.

Reproduces the reference's optimizer contract
(``configs/fcos_semi/...singlestage.py:183-198`` +
mmcv ``DefaultOptimizerConstructor`` + ``OptimizerHook``):

- SGD(momentum=0.9, weight_decay=1e-4) with **coupled** weight decay
  (torch adds wd*param to the gradient *before* the momentum buffer)
- ``paramwise_cfg``: non-norm bias params get lr×2, decay×0
- grad clipping by global norm 35
- LR: linear warmup (500 iters, start ratio 1/3) then step decay 0.1× at
  epoch boundaries [20, 26]
- ``frozen_stages``: stem + first stage(s) of the backbone receive zero
  updates (the JAX replacement for requires_grad=False)
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


# -- param classification ---------------------------------------------------

_NORM_TOKENS = ("bn", "gn", "norm", "stage_bn", "downsample_bn")


def _path_names(path) -> list[str]:
    return [getattr(p, "key", str(p)) for p in path]


def is_norm_param(path) -> bool:
    names = _path_names(path)
    return any(any(tok in n for tok in _NORM_TOKENS) for n in names[:-1])


def is_bias_param(path) -> bool:
    names = _path_names(path)
    return names[-1] == "bias" and not is_norm_param(path)


def frozen_backbone_mask(params: Any, frozen_stages: int,
                         backbone_key: str = "backbone") -> Any:
    """True where the parameter must NOT be updated.

    frozen_stages semantics (``resnet_rla.py:333-385``): >=0 freezes the stem
    (conv1/bn1); >=k freezes stages 1..k (layer{i}_*, and the RLA per-stage
    convs/bns of those stages).
    """
    def _frozen(path, _):
        names = _path_names(path)
        if not names or names[0] != backbone_key:
            return False
        if frozen_stages < 0 or len(names) < 2:
            return False
        n = names[1]
        if n in ("conv1", "bn1") and frozen_stages >= 0:
            return True
        for stage in range(1, frozen_stages + 1):
            if (n.startswith(f"layer{stage}_")
                    or n in (f"conv_out{stage - 1}",
                             f"recurrent_conv{stage - 1}")
                    or n.startswith(f"stage_bn{stage - 1}_")):
                return True
        return False

    return jax.tree_util.tree_map_with_path(_frozen, params)


# -- LR schedule ------------------------------------------------------------

def build_lr_schedule(base_lr: float, warmup_iters: int = 500,
                      warmup_ratio: float = 1.0 / 3.0,
                      step_epochs: Sequence[int] = (),
                      steps_per_epoch: int = 1,
                      gamma: float = 0.1) -> Callable:
    """mmcv 'step' policy with linear warmup (``lr_config`` in the configs)."""
    boundaries = [int(e * steps_per_epoch) for e in step_epochs]

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # linear warmup from base_lr*warmup_ratio to base_lr
        frac = jnp.clip(step / jnp.maximum(warmup_iters, 1), 0.0, 1.0)
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio) * frac)
        # step decay
        decay = jnp.asarray(1.0, jnp.float32)
        for b in boundaries:
            decay = decay * jnp.where(step >= b, gamma, 1.0)
        return warm * decay

    return schedule


# -- torch-SGD with paramwise lr/decay multipliers --------------------------

class SGDState(NamedTuple):
    momentum: Any
    count: jnp.ndarray


def make_optimizer(params: Any, base_lr_schedule: Callable,
                   momentum: float = 0.9, weight_decay: float = 1e-4,
                   bias_lr_mult: float = 2.0, bias_decay_mult: float = 0.0,
                   grad_clip_norm: float | None = 35.0,
                   frozen_mask: Any = None):
    """Returns an optax-style GradientTransformation implementing mmcv's
    SGD behavior. ``frozen_mask`` is a bool pytree (True = frozen)."""

    lr_mult = jax.tree_util.tree_map_with_path(
        lambda p, _: bias_lr_mult if is_bias_param(p) else 1.0, params)
    wd_mult = jax.tree_util.tree_map_with_path(
        lambda p, _: bias_decay_mult if is_bias_param(p) else 1.0, params)
    if frozen_mask is None:
        frozen_mask = jax.tree_util.tree_map(lambda _: False, params)

    def init_fn(params):
        return SGDState(
            momentum=jax.tree_util.tree_map(jnp.zeros_like, params),
            count=jnp.zeros((), jnp.int32))

    def update_fn(grads, state, params):
        # global-norm clip (mmcv OptimizerHook grad_clip)
        if grad_clip_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        # coupled weight decay
        grads = jax.tree_util.tree_map(
            lambda g, p, wm: g + weight_decay * wm * p, grads, params, wd_mult)
        # momentum buffer (torch: buf = mu*buf + grad)
        new_buf = jax.tree_util.tree_map(
            lambda b, g: momentum * b + g, state.momentum, grads)
        lr = base_lr_schedule(state.count)
        updates = jax.tree_util.tree_map(
            lambda b, lm, fz: jnp.where(fz, 0.0, -lr * lm * b),
            new_buf, lr_mult, frozen_mask)
        return updates, SGDState(momentum=new_buf, count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer_from_cfg(params: Any, optimizer_cfg: dict,
                             optimizer_config: dict | None = None,
                             lr_config: dict | None = None,
                             steps_per_epoch: int = 1,
                             frozen_mask: Any = None):
    """Wire the three reference config blocks into make_optimizer."""
    optimizer_cfg = dict(optimizer_cfg or {})
    opt_type = optimizer_cfg.get("type", "SGD")
    if opt_type != "SGD":
        raise NotImplementedError(f"optimizer {opt_type}")
    lr = optimizer_cfg.get("lr", 0.01)
    pw = dict(optimizer_cfg.get("paramwise_cfg", {}) or {})
    lrc = dict(lr_config or {})
    sched = build_lr_schedule(
        lr,
        warmup_iters=lrc.get("warmup_iters", 0),
        warmup_ratio=lrc.get("warmup_ratio", 1.0),
        step_epochs=lrc.get("step", ()),
        steps_per_epoch=steps_per_epoch,
        gamma=lrc.get("gamma", 0.1))
    clip = None
    if optimizer_config and optimizer_config.get("grad_clip"):
        clip = optimizer_config["grad_clip"].get("max_norm", 35.0)
    return make_optimizer(
        params, sched,
        momentum=optimizer_cfg.get("momentum", 0.9),
        weight_decay=optimizer_cfg.get("weight_decay", 1e-4),
        bias_lr_mult=pw.get("bias_lr_mult", 1.0),
        bias_decay_mult=pw.get("bias_decay_mult", 1.0),
        grad_clip_norm=clip,
        frozen_mask=frozen_mask), sched
