"""Gradient merging and freezing masks for Hebbian training.

Replaces the reference's stateful protocol (loss.backward(); every module's
``local_update()``; optimizer.step() — pretrain_hebbian_unsup_2d.py:190-195,
hebb.py:174-192) with pure pytree transforms inside one jitted step:

  grad_final[kernel] = (1 - alpha) * grad_backprop[kernel] - alpha * delta

and replaces ``requires_grad=False`` freezing (makehebbian.py:83) with an
optax mask over the parameter tree.
"""

import jax.numpy as jnp
from flax import traverse_util

from .spec import is_excluded


def hebb_delta_tree(hebb_vars):
    """Flatten the sown 'hebb' collection into {kernel-param-path: delta}.

    Sown entries live at (<module path...>, 'delta'); the matching kernel
    parameter lives at (<module path...>, 'kernel')."""
    flat = traverse_util.flatten_dict(hebb_vars)
    out = {}
    for path, value in flat.items():
        if path[-1] == "delta":
            out[path[:-1] + ("kernel",)] = value
    return out


def merge_hebbian_grads(grads, hebb_vars, alpha):
    """Blend backprop grads with Hebbian deltas on converted kernels."""
    if not hebb_vars:
        return grads
    deltas = hebb_delta_tree(hebb_vars)
    flat = traverse_util.flatten_dict(grads)
    for path, delta in deltas.items():
        if path in flat:
            flat[path] = (1.0 - alpha) * flat[path] - alpha * jnp.asarray(
                delta, flat[path].dtype)
    return traverse_util.unflatten_dict(flat)


def pretrain_trainable_mask(params, exclude):
    """Boolean mask pytree: True = parameter receives optimizer updates.

    Reference semantics during Hebbian/unsup pretraining: converted conv
    kernels update (via their local rule), excluded modules' parameters
    update (via backprop), everything else — BN affine, converted conv
    biases — is frozen (makehebbian.py:67,83)."""
    flat = traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        if is_excluded(path[:-1], exclude):
            mask[path] = True
        elif path[-1] == "kernel":
            mask[path] = True
        else:
            mask[path] = False
    return traverse_util.unflatten_dict(mask)


def apply_mask(tree, mask):
    """Zero leaves where mask is False (used on optimizer updates)."""
    flat = traverse_util.flatten_dict(tree)
    mflat = traverse_util.flatten_dict(mask)
    for path, m in mflat.items():
        if not m:
            flat[path] = jnp.zeros_like(flat[path])
    return traverse_util.unflatten_dict(flat)
