"""Shared model ops: pooling, PyTorch-semantics resizes, feature
perturbations, and norm layers used across the zoo.

These replicate the exact numerical contracts of the torch ops the
reference models rely on (align_corners=True bilinear/trilinear
upsampling, floor-indexed nearest interpolation, channel dropout,
CCT feature perturbations) as XLA-friendly static-shape functions.
All activations are channels-last (N, *spatial, C).
"""

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def remat_policy(name: Optional[str]):
    """Checkpoint policy for the rematted CCT shared decoders.

    ``None``: classic full remat — store only the region inputs,
    recompute the whole decoder in the backward (minimum HBM, maximum
    recompute).  ``"convs"``: save every tagged conv output
    (hebb.layers.CONV_SAVE_NAME) so the backward recomputes only the
    cheap elementwise tail (BN/ReLU/add/concat) — trades ~HBM for
    skipping all conv recompute FLOPs.  Gradients are bitwise-identical
    either way; only the memory/recompute split changes.
    """
    if name is None:
        return None
    if name == "convs":
        from ..hebb.layers import CONV_SAVE_NAME
        return jax.checkpoint_policies.save_only_these_names(
            CONV_SAVE_NAME)
    raise ValueError(f"unknown remat policy {name!r}")


def max_pool(x, window: int = 2, stride: Optional[int] = None):
    """MaxPool over all spatial dims of a channels-last tensor
    (torch nn.MaxPool2d/3d(kernel_size=2) parity)."""
    nd = x.ndim - 2
    stride = stride or window
    if min(x.shape[1:-1]) < window:
        raise ValueError(
            f"max_pool window {window} collapses a spatial dim of "
            f"{x.shape} to zero — the input/patch is too small for this "
            f"network's pooling depth (4-level UNets need >= 16 px/vox "
            f"per axis).  The torch reference errors on such sizes too.")
    dims = (1,) + (window,) * nd + (1,)
    strides = (1,) + (stride,) * nd + (1,)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")


@functools.lru_cache(maxsize=None)
def _linear_interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix implementing 1D linear interpolation with
    align_corners=True semantics (torch nn.Upsample(..., align_corners=True)).
    Constant-folded by XLA since shapes are static."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        m[:, 0] = 1.0
        return m
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.minimum(lo, n_in - 2)
    w = pos - lo
    m[np.arange(n_out), lo] = 1.0 - w
    m[np.arange(n_out), lo + 1] = w
    return m


def resize_linear_align_corners(x, out_spatial: Sequence[int]):
    """Bilinear / trilinear resize with align_corners=True, applied
    separably per axis as small matmuls (MXU-friendly, exact parity with
    torch Upsample(mode='bilinear'/'trilinear', align_corners=True))."""
    nd = x.ndim - 2
    assert len(out_spatial) == nd
    for d in range(nd):
        n_in, n_out = x.shape[1 + d], out_spatial[d]
        if n_in == n_out:
            continue
        m = jnp.asarray(_linear_interp_matrix(n_in, n_out), x.dtype)
        x = jnp.moveaxis(
            jnp.tensordot(m, x, axes=[[1], [1 + d]]), 0, 1 + d)
    return x


def resize_nearest_torch(x, out_spatial: Sequence[int]):
    """torch F.interpolate(mode='nearest') parity: src = floor(i*in/out)."""
    nd = x.ndim - 2
    for d in range(nd):
        n_in, n_out = x.shape[1 + d], out_spatial[d]
        if n_in == n_out:
            continue
        if n_out % n_in == 0:
            x = jnp.repeat(x, n_out // n_in, axis=1 + d)
        else:
            idx = (np.arange(n_out) * n_in) // n_out
            x = jnp.take(x, jnp.asarray(idx), axis=1 + d)
    return x


def instance_norm(x, eps: float = 1e-5):
    """torch InstanceNorm2d/3d defaults: per-sample per-channel spatial
    normalization, no affine, no running stats."""
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def batch_norm(parent: nn.Module, x, train: bool, name: str = "bn",
               gain_init: Optional[float] = None, dtype=None):
    """BatchNorm with torch defaults (eps 1e-5, running-stat momentum 0.1
    -> flax momentum 0.9). gain_init: stddev of N(1, gain) scale init used
    by the reference's 2D init_weights (unet.py:24-25)."""
    scale_init = (nn.initializers.ones if gain_init is None else
                  (lambda key, shape, dtype=jnp.float32:
                   1.0 + gain_init * jax.random.normal(key, shape, dtype)))
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        scale_init=scale_init, dtype=dtype, name=name)(x)


# ---------------------------------------------------------------------------
# CCT feature perturbations (unet_cct.py:153-182, unet3d_cct.py).
# The reference applies these unconditionally (F.dropout defaults
# training=True), so they perturb whenever an rng is supplied.
# ---------------------------------------------------------------------------

def feature_dropout_elementwise(key, x, p: float = 0.3):
    """functional Dropout(x, p) parity (unet_cct.py:153-155)."""
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def feature_noise(key, x, uniform_range: float = 0.3):
    """x * U(-r, r) + x with a noise vector shared across the batch
    (unet_cct.py:169-182)."""
    noise = jax.random.uniform(
        key, x.shape[1:], x.dtype, -uniform_range, uniform_range)
    return x * noise[None] + x


def feature_dropout_attention(key, x):
    """FeatureDropout (unet_cct.py:158-166): zero positions whose
    channel-mean activation exceeds a random fraction of its max."""
    attention = jnp.mean(x, axis=-1, keepdims=True)
    max_val = jnp.max(attention.reshape(x.shape[0], -1), axis=1)
    frac = jax.random.uniform(key, (), x.dtype, 0.7, 0.9)
    threshold = (max_val * frac).reshape((-1,) + (1,) * (x.ndim - 1))
    return x * (attention < threshold).astype(x.dtype)


def perturb_features(key, feats: Tuple, kind: str):
    """Apply one CCT perturbation to a list of feature maps."""
    keys = jax.random.split(key, len(feats))
    fns = {
        "noise": feature_noise,
        "dropout": feature_dropout_elementwise,
        "feature_dropout": feature_dropout_attention,
    }
    fn = fns[kind]
    return [fn(k, f) for k, f in zip(keys, feats)]


CCT_PERTURB_KINDS = ("noise", "dropout", "feature_dropout")


def cct_aux_outputs(key, clean_levels, perturb_one, decode, n,
                    batched: bool):
    """The CCT clean + 3-perturbed shared-decoder protocol
    (train_semi_CCT_2d.py / unet3d_cct.py:125-205 semantics), shared by
    every folded CCT variant (unet_cct_s2d / unet3d_cct_s2d /
    vnet_cct_s2d and their *_batched twins).

    clean_levels: per-level feature tensors in DECODER layout.
    perturb_one(key, kind) -> perturbed per-level list, SAME layout
        (each model owns its fold/unfold mapping so the perturbation
        itself runs in the original layout with identical rng draws).
    decode(levels) -> logits for one decoder pass over such a list.
    n: per-pass batch size (for slicing the batched output).

    batched=False: 4 serial decoder passes — the protocol-exact path.
    batched=True: ONE 4N-batched decode, sliced back into 4 — the
        documented train-mode BN deviation (stats over the combined 4N
        batch); eval-exact since eval has no perturbed passes.
    perturb_one is pure in `key` (jax.random, no flax state), so
    computing the perturbations up front draws bitwise the same numbers
    as the serial protocol's interleaved order."""
    keys = jax.random.split(key, 3)
    pert = [perturb_one(k, kind)
            for k, kind in zip(keys, CCT_PERTURB_KINDS)]
    if batched:
        stacked = [jnp.concatenate([c] + [p[lv] for p in pert], axis=0)
                   for lv, c in enumerate(clean_levels)]
        out = decode(stacked)
        return tuple(out[i * n:(i + 1) * n] for i in range(4))
    return (decode(clean_levels), *[decode(p) for p in pert])
