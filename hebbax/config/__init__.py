from .datasets import dataset_cfg
from .ramps import sigmoid_rampup, linear_rampup, cosine_rampdown
from .schedules import warmup_step_schedule

__all__ = [
    "dataset_cfg",
    "sigmoid_rampup",
    "linear_rampup",
    "cosine_rampdown",
    "warmup_step_schedule",
]
