from .spec import HebbSpec, default_hebb_params, is_excluded
from .rules import (
    swta_conv_delta,
    hpca_conv_delta,
    swta_t_delta,
    hpca_t_delta,
    contrastive_delta,
    normalize,
)
from .layers import HConv, HConvTranspose
from .surgery import (
    hebb_delta_tree,
    merge_hebbian_grads,
    pretrain_trainable_mask,
)

__all__ = [
    "HebbSpec",
    "default_hebb_params",
    "is_excluded",
    "swta_conv_delta",
    "hpca_conv_delta",
    "swta_t_delta",
    "hpca_t_delta",
    "contrastive_delta",
    "normalize",
    "HConv",
    "HConvTranspose",
    "hebb_delta_tree",
    "merge_hebbian_grads",
    "pretrain_trainable_mask",
]
