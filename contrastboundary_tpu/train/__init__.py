from .state import TrainState, create_train_state
from .schedule import exponential_epoch_decay, multistep_epoch_decay
from .trainer import (TrainStepConfig, make_train_step,
                      make_train_step_with_fallback,
                      make_eval_step, make_eval_step_with_fallback, Trainer)

__all__ = [
    "TrainState",
    "create_train_state",
    "exponential_epoch_decay",
    "multistep_epoch_decay",
    "TrainStepConfig",
    "make_train_step",
    "make_train_step_with_fallback",
    "make_eval_step_with_fallback",
    "make_eval_step",
    "Trainer",
]
