"""The single jitted train step: loss → grad → SGD → EMA, over the mesh.

This is the TPU-native core replacing the reference's hot loop
(SURVEY.md §3.1): DDP backward allreduce, OptimizerHook, EMAOWNHook and the
``reduce_mean`` normalizer sync all become one compiled XLA program. The step
is jitted with the batch sharded over the mesh's ``data`` axis and state
replicated; XLA inserts the gradient/normalizer collectives (ICI) itself.

EMA gating (interval / start_point, reference ``ema.py:4-44``) is data-driven
via ``jnp.where`` so one compiled program serves all iterations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dsl_tpu.models.detectors.single_stage import detector_loss
from dsl_tpu.parallel.mesh import batch_sharding, replicated
from dsl_tpu.train.train_state import TrainState, ema_update


def make_train_step(detector, tx,
                    ema_interval: int = 1, ema_start_iter: int = 0,
                    donate: bool = True, compute_dtype=None,
                    frozen_mask=None) -> Callable:
    """Build ``train_step(state, batch) -> (state, metrics)`` (un-jitted).

    ``compute_dtype=jnp.bfloat16`` enables mixed precision (bf16 forward,
    f32 master weights / loss / optimizer). ``frozen_mask`` (bool pytree,
    True = frozen) makes ``jax.grad`` differentiate only the trainable
    subtree — frozen-stage gradients are never computed, not just zeroed
    (the compute-level analog of requires_grad=False)."""

    def train_step(state: TrainState, batch: dict):
        if frozen_mask is not None:
            frozen_flat = jax.tree_util.tree_leaves(frozen_mask)
            leaves, treedef = jax.tree_util.tree_flatten(state.params)
            trainable = [l for l, f in zip(leaves, frozen_flat) if not f]
            frozen = [l for l, f in zip(leaves, frozen_flat) if f]

            def _merge(train_leaves):
                ti, fi, out = 0, 0, []
                for f in frozen_flat:
                    if f:
                        out.append(frozen[fi])
                        fi += 1
                    else:
                        out.append(train_leaves[ti])
                        ti += 1
                return jax.tree_util.tree_unflatten(treedef, out)
        else:
            def _merge(train_leaves):
                return train_leaves
            trainable = state.params

        def loss_fn(trainable_params):
            params = _merge(trainable_params)
            variables = {"params": params, "batch_stats": state.batch_stats}
            total, log_vars = detector_loss(
                detector, variables, batch, cur_iter=state.step,
                compute_dtype=compute_dtype)
            return total, log_vars

        (loss, log_vars), t_grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        if frozen_mask is not None:
            # expand back to the full tree with zero grads on frozen leaves
            zi = iter(t_grads)
            full = [jnp.zeros_like(l) if f else next(zi)
                    for l, f in zip(leaves, frozen_flat)]
            grads = jax.tree_util.tree_unflatten(treedef, full)
        else:
            grads = t_grads
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)

        # EMA teacher update, gated in-graph
        step = state.step
        do_ema = jnp.logical_and(
            step + 1 >= ema_start_iter,
            (step + 1) % ema_interval == 0) if ema_interval > 0 else (
            jnp.zeros((), bool))
        # first EMA call initializes the blend exactly like later ones
        # (reference initializes teacher from the pretrained weights at build
        # time, then blends; teacher_params already starts as a copy).
        # keep-rate comes from state so EMAOWNHook-style step decay works
        # without recompiling.
        blended = ema_update(state.teacher_params, new_params,
                             state.ema_ratio)
        new_teacher = jax.tree_util.tree_map(
            lambda b, t: jnp.where(do_ema, b, t), blended,
            state.teacher_params)

        new_state = state.replace(
            params=new_params,
            teacher_params=new_teacher,
            opt_state=new_opt_state,
            step=step + 1,
            ema_initialized=jnp.logical_or(state.ema_initialized, do_ema),
        )
        metrics = dict(log_vars)
        metrics["grad_norm"] = _global_norm(grads)
        return new_state, metrics

    return train_step


def _global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))


def jit_train_step(train_step: Callable, mesh) -> Callable:
    """Jit over the mesh: batch on 'data' (placed by ``shard_batch``,
    which replicates non-batch leaves like traced hyperparameters), state
    replicated. Input shardings follow the explicit placements."""
    rep = replicated(mesh)
    return jax.jit(
        train_step,
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_eval_step(detector, test_cfg: dict | None = None,
                   use_teacher: bool = False) -> Callable:
    """Build ``eval_step(state, images, img_shapes, scale_factors)`` returning
    fixed-size detections. Evaluating the EMA model when ``use_teacher``
    matches the reference's ``ema_flag`` validation path
    (``semi_epoch_based_runner.py:273-289``)."""
    from dsl_tpu.models.detectors.single_stage import detector_predict

    def eval_step(state: TrainState, images, img_shapes=None,
                  scale_factors=None):
        variables = (state.teacher_variables if use_teacher
                     else state.student_variables)
        return detector_predict(detector, variables, images,
                                img_shapes=img_shapes,
                                scale_factors=scale_factors,
                                test_cfg=test_cfg)

    return eval_step


def jit_eval_step(eval_step: Callable, mesh) -> Callable:
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_step,
                   in_shardings=(rep, bsh, bsh, bsh),
                   out_shardings=bsh)


def jit_train_step_fsdp(train_step: Callable, mesh, state_example) -> Callable:
    """Jit with the TrainState sharded FSDP-style over the ``data`` axis
    (params/EMA/optimizer moments partitioned; XLA all-gathers weights at
    use and reduce-scatters gradients — ZeRO-3 semantics with zero manual
    collectives). ``state_example`` provides the pytree structure/shapes."""
    from dsl_tpu.parallel.mesh import fsdp_sharding

    ssh = fsdp_sharding(mesh, state_example)
    return jax.jit(
        train_step,
        out_shardings=(ssh, replicated(mesh)),
        donate_argnums=(0,),
    )
