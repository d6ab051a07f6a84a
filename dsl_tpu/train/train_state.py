"""Train state: one pytree holding student, EMA teacher, optimizer, step.

The reference keeps the teacher as a *second DDP model* updated by state-dict
copies under ``dist.barrier()``
(``/root/reference/mmdet/runner/hooks/semi_epoch_based_runner.py:368-409``).
Here the teacher is just another weight subtree inside the jitted train step's
state — the EMA blend is elementwise arithmetic inside the compiled program,
no barriers, no host copies (SURVEY.md §7 architecture stance).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any                    # student trainable params
    batch_stats: Any               # frozen BN stats (shared student/teacher)
    teacher_params: Any            # EMA teacher weights
    opt_state: Any
    step: jnp.ndarray              # global iteration counter
    ema_initialized: jnp.ndarray   # bool scalar: first EMA() done?
    ema_ratio: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.asarray(0.99, jnp.float32))
    # dynamic EMA keep-rate: EMAOWNHook's step_decay rewrites it at LR-decay
    # epochs (ratio -> max(1-(1-ratio)/decay_ratio, 0.01), ema.py:22-26)
    # without recompiling the train step.

    @property
    def student_variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def teacher_variables(self):
        return {"params": self.teacher_params,
                "batch_stats": self.batch_stats}


def create_train_state(variables: dict, tx,
                       ema_ratio: float = 0.99) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_initialized=jnp.zeros((), bool),
        ema_ratio=jnp.asarray(ema_ratio, jnp.float32),
    )


def ema_update(teacher: Any, student: Any, keep_rate) -> Any:
    """teacher*keep + student*(1-keep) (reference ``EMA`` blend :389-399)."""
    return jax.tree_util.tree_map(
        lambda t, s: t * keep_rate + s * (1.0 - keep_rate), teacher, student)
