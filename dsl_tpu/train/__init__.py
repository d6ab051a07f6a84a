from dsl_tpu.train.train_state import (  # noqa: F401
    TrainState, create_train_state, ema_update)
from dsl_tpu.train.optim import (  # noqa: F401
    build_lr_schedule, build_optimizer_from_cfg, frozen_backbone_mask,
    make_optimizer)
from dsl_tpu.train.train_step import (  # noqa: F401
    jit_eval_step, jit_train_step, make_eval_step, make_train_step)
