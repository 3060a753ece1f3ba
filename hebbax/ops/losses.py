"""Segmentation and SSL losses as pure JAX functions.

Behavioral parity targets (reference /root/reference/loss/loss_function.py):
  - dice_loss           == DiceLoss (:74-120) / BinaryDiceLoss (:32-71)
  - cross_entropy_loss  == MixSoftmaxCrossEntropyLoss (:9-30)
  - softmax_mse_loss    == softmax_mse_loss (:123-139)
  - entropy_loss        == entropy_loss (:142-147)
  - bce_bound_loss      == BCELossBoud (:149-184)
  - kl_loss             == CustomKLLoss (:187-198)
  - elbo_metric         == utils.elbo_metric (/root/reference/utils.py:617-625)

Conventions: channels-last logits ``(N, ..., C)``; integer masks ``(N, ...)``
with ``ignore_index=-1`` marking invalid pixels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def weighted_mean(x, w):
    """Mean of ``x`` over all elements with per-sample weights ``w`` (N,).

    With ``w=None`` this is ``jnp.mean(x)``.  With a 0/1 validity vector
    (data-parallel padded batches, parallel/mesh.py) it equals the plain
    mean over the valid samples only — the quantity the reference computes
    on the true partial batch it never pads."""
    if w is None:
        return jnp.mean(x)
    wb = w.reshape((-1,) + (1,) * (x.ndim - 1))
    denom = jnp.sum(w) * float(np.prod(x.shape[1:]))
    return jnp.sum(x * wb) / jnp.maximum(denom, 1.0)


def _one_hot_valid(target, num_classes, ignore_index=-1):
    valid = (target != ignore_index).astype(jnp.float32)
    onehot = jax.nn.one_hot(jnp.clip(target, 0, None), num_classes)
    return onehot, valid


def dice_loss(logits, target, num_classes=None, smooth=1.0, p=2,
              ignore_index=-1):
    """Soft multi-class dice with smooth=1, p=2, batch-mean reduction.

    For each class c: loss_c = mean_n(1 - (2*sum(p*t)+s)/(sum(p^p+t^p)+s));
    returns the class-average, matching DiceLoss._base_forward.
    """
    if num_classes is None:
        num_classes = logits.shape[-1]
    # mixed-precision hygiene: losses always reduce in f32 — bf16 sums
    # over H*W pixels lose enough precision to destabilize late training
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    onehot, valid = _one_hot_valid(target, num_classes, ignore_index)
    n = logits.shape[0]
    probs = probs.reshape(n, -1, num_classes)
    onehot = onehot.reshape(n, -1, num_classes)
    valid = valid.reshape(n, -1, 1)
    num = 2.0 * jnp.sum(probs * onehot * valid, axis=1) + smooth
    den = jnp.sum((probs ** p + onehot ** p) * valid, axis=1) + smooth
    # batch mean over EFFECTIVE samples: a sample with zero valid pixels
    # (mask all ignore_index — only dp padding produces these,
    # parallel/mesh.py) contributes nothing and is not counted, so a
    # padded dp batch yields exactly the unpadded-batch loss.  For fully
    # valid batches this equals the reference's plain batch mean.
    sample_valid = (jnp.sum(valid, axis=1) > 0).astype(probs.dtype)  # (N,1)
    n_eff = jnp.maximum(jnp.sum(sample_valid), 1.0)
    per_class = jnp.sum((1.0 - num / den) * sample_valid, axis=0) / n_eff
    return jnp.mean(per_class)


def cross_entropy_loss(logits, target, ignore_index=-1):
    """Pixel-mean CE over valid pixels (ignore_index masked out)."""
    num_classes = logits.shape[-1]
    valid = (target != ignore_index).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(jnp.clip(target, 0, None), num_classes)
    nll = -jnp.sum(onehot * logp, axis=-1) * valid
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1.0)


def aux_weighted(loss_fn, outputs, target, aux_weight):
    """Main output + aux_weight * each auxiliary output (MixSoftmax/Dice aux)."""
    loss = loss_fn(outputs[0], target)
    for out in outputs[1:]:
        loss = loss + aux_weight * loss_fn(out, target)
    return loss


def segmentation_loss(loss="dice", aux=False, num_classes=None):
    """Loss factory mirroring the reference's segmentation_loss (:201-215)."""
    if loss in ("dice", "DICE"):
        base = dice_loss
        aw = 0.4
    elif loss in ("crossentropy", "CE"):
        base = cross_entropy_loss
        aw = 0.2
    elif loss == "bce":
        def base(logits, target):
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            valid = (target != -1).astype(jnp.float32)
            t = jnp.maximum(target.astype(jnp.float32), 0.0)
            eps = 1e-7
            bce = (t * jnp.log(probs + eps)
                   + (1 - t) * jnp.log(1 - probs + eps)) * valid
            return -jnp.sum(bce) / jnp.maximum(jnp.sum(valid), 1.0)
        aw = 0.4
    elif loss == "bcebound":
        base = functools.partial(bce_bound_loss, num_classes=num_classes)
        aw = 0.4
    else:
        raise ValueError(f"loss {loss!r} not supported")

    if aux:
        return lambda outputs, target: aux_weighted(base, outputs, target, aw)
    return base


def softmax_mse_loss(input_logits, target_logits, sigmoid=False):
    """Elementwise MSE of softmaxes; no gradient into targets."""
    if sigmoid:
        a = jax.nn.sigmoid(input_logits)
        b = jax.nn.sigmoid(target_logits)
    else:
        a = jax.nn.softmax(input_logits, axis=-1)
        b = jax.nn.softmax(target_logits, axis=-1)
    return (a - jax.lax.stop_gradient(b)) ** 2


def entropy_loss(probs, num_classes=2, weight=None):
    """Mean pixel entropy of a softmax map, normalized by log(C).

    weight: optional per-sample 0/1 validity vector (dp padded batches)."""
    ent = -jnp.sum(probs * jnp.log(probs + 1e-6), axis=-1)
    return weighted_mean(ent, weight) / jnp.log(num_classes)


def bce_bound_loss(logits, target, num_classes=2):
    """Per-class log-frequency-weighted BCE on softmax probabilities (3D).

    Pixels with target == -1 (ignore_index; dp padding) are excluded from
    both the BCE mean and the positive-frequency weight; on fully valid
    batches this is the reference formula verbatim."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot, valid = _one_hot_valid(target, num_classes)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    losses = []
    for i in range(num_classes):
        p = jnp.clip(probs[..., i], 1e-3, 1 - 1e-3)
        t = onehot[..., i] * valid
        # positive-class weight: log(V / (#positives + 1))
        tt = jnp.log(n_valid / (jnp.sum(t) + 1))
        bce = (tt * t * jnp.log(p) + (1 - t) * jnp.log(1 - p)) * valid
        losses.append(-jnp.sum(bce) / n_valid)
    return jnp.mean(jnp.stack(losses))


def kl_loss(mean, std):
    """|E[m^2]| + |E[s^2]| - |E[log s^2]| - 1 (VAE KL surrogate)."""
    return (jnp.mean(mean * mean) + jnp.mean(std * std)
            - jnp.mean(jnp.log(std * std)) - 1.0)


def elbo_metric(vae_outputs, targets, beta=1.0, weight=None):
    """MSE reconstruction + beta * KLD, the VAE pretraining objective.

    weight: optional per-sample 0/1 validity vector (dp padded batches)."""
    reconstr = vae_outputs["reconstr"]
    mu = vae_outputs["mu"]
    log_var = vae_outputs["log_var"]
    reconstr_loss = weighted_mean((reconstr - targets) ** 2, weight)
    # sum over channel (latent) axis, mean over batch/space
    kld = weighted_mean(
        -0.5 * jnp.sum(1 + log_var - mu ** 2 - jnp.exp(log_var), axis=-1),
        weight)
    return reconstr_loss + beta * kld
