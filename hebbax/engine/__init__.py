"""hebbax training engine — pure jitted steps + epoch harnesses."""

from .loop import SupTrainer
from .state import TrainState, init_state
from .steps import make_eval_step, make_sup_train_step

__all__ = ["SupTrainer", "TrainState", "init_state", "make_eval_step",
           "make_sup_train_step"]
