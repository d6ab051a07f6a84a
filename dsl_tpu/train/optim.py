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
        if len(names) >= 2 and names[1] == "stage_bn3_2":
            # reference ``_freeze_stages`` unconditionally sets
            # requires_grad=False on ``stage_bns[3][2]`` (resnet_rla.py:360-362)
            # — the RLA hidden-state BN after the last stage-4 block, whose
            # output is discarded (zero grad; freezing also skips its weight
            # decay, matching torch-SGD's p.grad-is-None skip).
            return True
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
                      gamma: float = 0.1,
                      policy: str = "step",
                      total_iters: int | None = None,
                      min_lr_ratio: float = 0.0,
                      power: float = 1.0) -> Callable:
    """mmcv lr policies with linear warmup (``lr_config`` in the configs).

    ``policy``: 'step' (``StepLrUpdaterHook``), 'CosineAnnealing'
    (``CosineAnnealingLrUpdaterHook``: cosine from base to
    ``base*min_lr_ratio`` over ``total_iters``), or 'poly'
    (``PolyLrUpdaterHook``)."""
    boundaries = [int(e * steps_per_epoch) for e in step_epochs]

    def schedule(step):
        import numpy as np

        step = jnp.asarray(step, jnp.float32)
        # linear warmup from base_lr*warmup_ratio to base_lr
        if warmup_iters > 0:
            frac = jnp.clip(step / warmup_iters, 0.0, 1.0)
            warm = base_lr * (warmup_ratio + (1 - warmup_ratio) * frac)
        else:
            warm = jnp.asarray(base_lr, jnp.float32)
        pol = policy.lower()
        if pol == "step":
            decay = jnp.asarray(1.0, jnp.float32)
            for b in boundaries:
                decay = decay * jnp.where(step >= b, gamma, 1.0)
            return warm * decay
        if not total_iters:
            raise ValueError(
                f"lr policy {policy!r} needs total_iters (pass total_epochs "
                "to build_optimizer_from_cfg — runner.max_epochs)")
        prog = jnp.clip(step / int(total_iters), 0.0, 1.0)
        if pol == "cosineannealing":
            cos = 0.5 * (1.0 + jnp.cos(np.pi * prog))
            decay = min_lr_ratio + (1.0 - min_lr_ratio) * cos
        elif pol == "poly":
            decay = jnp.maximum((1.0 - prog) ** power, min_lr_ratio)
        elif pol == "cyclic":
            # one-cycle triangular ramp (mmcv ``CyclicLrUpdaterHook``,
            # target_ratio=(10, 1e-4), step_ratio_up=0.4): up to
            # 10x base over the first 40%, down to 1e-4x after
            up = jnp.minimum(prog / 0.4, 1.0)
            down = jnp.clip((prog - 0.4) / 0.6, 0.0, 1.0)
            decay = jnp.where(prog < 0.4,
                              1.0 + (10.0 - 1.0) * up,
                              10.0 + (1e-4 - 10.0) * down)
        else:
            raise ValueError(f"unknown lr policy {policy}")
        return warm * decay

    return schedule


def build_momentum_schedule(base_momentum: float,
                            policy: str = "cyclic",
                            target_ratio: Sequence[float] = (0.85 / 0.95, 1.0),
                            step_ratio_up: float = 0.4,
                            total_iters: int | None = None,
                            anneal_strategy: str = "cos") -> Callable:
    """mmcv ``CyclicMomentumUpdaterHook`` (``momentum_config`` in cfg).

    Momentum runs INVERSE to the cyclic LR: from ``base`` down to
    ``base*target_ratio[0]`` over the first ``step_ratio_up`` of the run,
    then back up to ``base*target_ratio[1]`` (mmcv defaults shown). Each
    phase anneals with mmcv's default 'cos' strategy
    (``annealing_cos(start, end, pct) = end + 0.5*(start-end)*(cos(pi*pct)+1)``);
    ``anneal_strategy='linear'`` matches mmcv's ``annealing_linear``. No
    reference config sets ``momentum_config`` (grep-verified), but the
    reference runner registers it (``semi_epoch_based_runner.py:476-502``),
    so the knob exists here too."""
    if policy.lower() != "cyclic":
        raise ValueError(f"unknown momentum policy {policy}")
    if not total_iters:
        raise ValueError("momentum policy 'cyclic' needs total_iters")
    if anneal_strategy not in ("cos", "linear"):
        raise ValueError(f"unknown anneal_strategy {anneal_strategy}")
    hi, end = float(target_ratio[0]), float(target_ratio[1])

    def _anneal(start, stop, pct):
        if anneal_strategy == "cos":
            return stop + 0.5 * (start - stop) * (jnp.cos(jnp.pi * pct) + 1.0)
        return start + (stop - start) * pct

    def schedule(step):
        prog = jnp.clip(jnp.asarray(step, jnp.float32) / int(total_iters),
                        0.0, 1.0)
        up = jnp.minimum(prog / step_ratio_up, 1.0)
        down = jnp.clip((prog - step_ratio_up) / (1.0 - step_ratio_up),
                        0.0, 1.0)
        ratio = jnp.where(prog < step_ratio_up,
                          _anneal(1.0, hi, up),
                          _anneal(hi, end, down))
        return base_momentum * ratio

    return schedule


# -- torch-SGD with paramwise lr/decay multipliers --------------------------

class SGDState(NamedTuple):
    momentum: Any
    count: jnp.ndarray


def make_optimizer(params: Any, base_lr_schedule: Callable,
                   momentum: float | Callable = 0.9,
                   weight_decay: float = 1e-4,
                   bias_lr_mult: float = 2.0, bias_decay_mult: float = 0.0,
                   grad_clip_norm: float | None = 35.0,
                   frozen_mask: Any = None):
    """Returns an optax-style GradientTransformation implementing mmcv's
    SGD behavior. ``frozen_mask`` is a bool pytree (True = frozen).
    ``momentum`` may be a per-step schedule (``build_momentum_schedule``)."""
    momentum_fn = momentum if callable(momentum) else (lambda _: momentum)

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
        mu = momentum_fn(state.count)
        new_buf = jax.tree_util.tree_map(
            lambda b, g: mu * b + g, state.momentum, grads)
        lr = base_lr_schedule(state.count)
        updates = jax.tree_util.tree_map(
            lambda b, lm, fz: jnp.where(fz, 0.0, -lr * lm * b),
            new_buf, lr_mult, frozen_mask)
        return updates, SGDState(momentum=new_buf, count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


class AdamWState(NamedTuple):
    mu: Any
    nu: Any
    count: Any


def make_adamw(params: Any, base_lr_schedule: Callable,
               betas=(0.9, 0.999), eps: float = 1e-8,
               weight_decay: float = 0.0001,
               custom_lr_mults: dict | None = None,
               grad_clip_norm: float | None = None,
               frozen_mask: Any = None):
    """torch-AdamW semantics (decoupled weight decay) with mmcv
    ``paramwise_cfg.custom_keys`` lr multipliers — the optimizer of the
    DETR / Deformable DETR / Sparse R-CNN configs (e.g.
    ``configs/detr/detr_r50_8x2_150e_coco.py``: ``backbone`` lr_mult 0.1)."""
    custom = dict(custom_lr_mults or {})

    def _mult(path):
        names = _path_names(path)
        for key, m in custom.items():
            if any(key in n for n in names):
                return float(m)
        return 1.0

    lr_mult = jax.tree_util.tree_map_with_path(
        lambda p, _: _mult(p), params)
    if frozen_mask is None:
        frozen_mask = jax.tree_util.tree_map(lambda _: False, params)
    b1, b2 = betas

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamWState(mu=z, nu=jax.tree_util.tree_map(
            jnp.zeros_like, params), count=jnp.zeros((), jnp.int32))

    def update_fn(grads, state, params):
        if grad_clip_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        lr = base_lr_schedule(state.count)
        updates = jax.tree_util.tree_map(
            lambda m, v, p, lm, fz: jnp.where(
                fz, 0.0,
                -lr * lm * ((m / c1) / (jnp.sqrt(v / c2) + eps)
                            + weight_decay * p)),
            mu, nu, params, lr_mult, frozen_mask)
        return updates, AdamWState(mu=mu, nu=nu, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer_from_cfg(params: Any, optimizer_cfg: dict,
                             optimizer_config: dict | None = None,
                             lr_config: dict | None = None,
                             steps_per_epoch: int = 1,
                             frozen_mask: Any = None,
                             total_epochs: int | None = None,
                             momentum_config: dict | None = None):
    """Wire the reference config blocks (optimizer / optimizer_config /
    lr_config / momentum_config) into make_optimizer."""
    optimizer_cfg = dict(optimizer_cfg or {})
    opt_type = optimizer_cfg.get("type", "SGD")
    lr = optimizer_cfg.get("lr", 0.01)
    pw = dict(optimizer_cfg.get("paramwise_cfg", {}) or {})
    lrc = dict(lr_config or {})
    total_iters = None
    if total_epochs:
        total_iters = int(total_epochs) * max(steps_per_epoch, 1)
    sched = build_lr_schedule(
        lr,
        warmup_iters=lrc.get("warmup_iters", 0),
        warmup_ratio=lrc.get("warmup_ratio", 1.0),
        step_epochs=lrc.get("step", ()),
        steps_per_epoch=steps_per_epoch,
        gamma=lrc.get("gamma", 0.1),
        policy=lrc.get("policy", "step"),
        total_iters=total_iters,
        min_lr_ratio=lrc.get("min_lr_ratio", 0.0),
        power=lrc.get("power", 1.0))
    clip = None
    if optimizer_config and optimizer_config.get("grad_clip"):
        clip = optimizer_config["grad_clip"].get("max_norm", 35.0)
    if opt_type in ("AdamW", "Adam"):
        if momentum_config:
            # mmcv momentum hooks DO update Adam betas; that coupling isn't
            # wired here — reject loudly rather than silently ignore.
            raise NotImplementedError(
                "momentum_config with Adam/AdamW (beta1 scheduling) is not "
                "supported; use an SGD optimizer or drop momentum_config")
        custom = {k: v.get("lr_mult", 1.0) for k, v in
                  dict(pw.get("custom_keys", {}) or {}).items()}
        return make_adamw(
            params, sched,
            betas=tuple(optimizer_cfg.get("betas", (0.9, 0.999))),
            eps=optimizer_cfg.get("eps", 1e-8),
            weight_decay=optimizer_cfg.get("weight_decay",
                                           0.0 if opt_type == "Adam"
                                           else 1e-4),
            custom_lr_mults=custom,
            grad_clip_norm=clip,
            frozen_mask=frozen_mask), sched
    if opt_type != "SGD":
        raise NotImplementedError(f"optimizer {opt_type}")
    momentum: float | Callable = optimizer_cfg.get("momentum", 0.9)
    if momentum_config:
        mc = dict(momentum_config)
        momentum = build_momentum_schedule(
            float(momentum),
            policy=mc.get("policy", "cyclic"),
            target_ratio=tuple(mc.get("target_ratio", (0.85 / 0.95, 1.0))),
            step_ratio_up=mc.get("step_ratio_up", 0.4),
            total_iters=total_iters,
            anneal_strategy=mc.get("anneal_strategy", "cos"))
    return make_optimizer(
        params, sched,
        momentum=momentum,
        weight_decay=optimizer_cfg.get("weight_decay", 1e-4),
        bias_lr_mult=pw.get("bias_lr_mult", 1.0),
        bias_decay_mult=pw.get("bias_decay_mult", 1.0),
        grad_clip_norm=clip,
        frozen_mask=frozen_mask), sched
