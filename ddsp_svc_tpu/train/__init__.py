from .checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    restore_variables,
    latest_checkpoint,
)
from .step import (
    TrainState,
    create_optimizer,
    create_train_state,
    make_train_step,
    make_train_step_multi,
    make_train_step_pool,
    make_train_step_pool_multi,
    make_eval_step,
)
from .saver import Saver
from . import solver

__all__ = [
    "save_checkpoint", "restore_checkpoint", "restore_variables", "latest_checkpoint",
    "TrainState", "create_optimizer", "create_train_state",
    "make_train_step", "make_train_step_multi", "make_train_step_pool", "make_train_step_pool_multi", "make_eval_step",
    "Saver", "solver",
]
