"""Training subsystem: optimizer groups, train state/steps, checkpointing."""

from ait_tpu.train.optim import lr_schedule, make_optimizer, make_param_labels
from ait_tpu.train.state import (TrainState, init_params, make_eval_step,
                                 make_fused_eval_step, make_train_step)

__all__ = [
    "TrainState", "init_params", "make_eval_step", "make_fused_eval_step",
    "make_train_step",
    "lr_schedule", "make_optimizer", "make_param_labels",
]
