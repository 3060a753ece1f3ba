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
from .distance import assd, eval_distance_offline, hd95, mask_to_sdf
from .ema import update_ema
from .morphology import postprocess_3d_pred
from .superpix import superpix_batch, superpix_region
from .wavelets import dwt2, dwtn3

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
    "assd", "eval_distance_offline", "hd95", "mask_to_sdf",
    "update_ema", "postprocess_3d_pred",
    "superpix_batch", "superpix_region", "dwt2", "dwtn3",
]
