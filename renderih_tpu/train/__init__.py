"""Training runtime: optimizer, LR schedules, train state, SPMD step."""

from renderih_tpu.train.schedule import warmup_step_decay_schedule
from renderih_tpu.train.state import TrainState, create_train_state
from renderih_tpu.train.trainer import make_train_step, make_eval_step

__all__ = [
    "warmup_step_decay_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
