from .losses import (
    dice_loss,
    cross_entropy_loss,
    segmentation_loss,
    softmax_mse_loss,
    entropy_loss,
    bce_bound_loss,
    kl_loss,
    elbo_metric,
)
from .metrics import (
    SweepAccumulator,
    ConfusionAccumulator,
    eval_single_class,
    eval_multi_class,
    evaluate,
    THRESHOLDS,
)

__all__ = [
    "dice_loss",
    "cross_entropy_loss",
    "segmentation_loss",
    "softmax_mse_loss",
    "entropy_loss",
    "bce_bound_loss",
    "kl_loss",
    "elbo_metric",
    "SweepAccumulator",
    "ConfusionAccumulator",
    "eval_single_class",
    "eval_multi_class",
    "evaluate",
    "THRESHOLDS",
]
