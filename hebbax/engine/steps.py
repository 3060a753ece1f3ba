"""Jitted train/eval step factories.

Each factory closes over the static configuration (model, optimizer,
output structure, Hebbian blending) and returns a pure jitted function
``(state, batch, key) -> (state, aux)`` with the state buffers donated.
This replaces the reference's per-script training loops
(/root/reference/train_sup_2d.py:207-242,
/root/reference/pretrain_hebbian_unsup_2d.py:174-195) with shared
combinators; semi-supervised algorithms plug in an ``unsup_loss``
callable rather than copying the loop.
"""

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..hebb.surgery import apply_mask, merge_hebbian_grads
from ..models.registry import primary_logits
from .state import TrainState


def _model_rngs(key, extra=()):
    names = ("dropout", "hebb", "perturb", "latent")[:]
    keys = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, keys)}


def forward_train(model, variables, images, key, mutable=("batch_stats",
                                                          "hebb")):
    return model.apply(variables, images, train=True,
                       rngs=_model_rngs(key), mutable=list(mutable))


def forward_eval(model, variables, images, key=None):
    rngs = _model_rngs(key) if key is not None else None
    return model.apply(variables, images, train=False, rngs=rngs)


def sup_loss_fn(criterion, network, outputs, mask, deep_supervision=False):
    """Supervised loss with the reference's deep-supervision averaging
    (train_sup_2d.py:222-227) and per-variant output unpacking."""
    if deep_supervision and isinstance(outputs, tuple):
        loss = sum(criterion(o, mask) for o in outputs) / len(outputs)
    else:
        loss = criterion(primary_logits(network, outputs), mask)
    return loss


def make_sup_train_step(model, network: str, criterion, tx,
                        deep_supervision: bool = False,
                        hebb_alpha: float = 0.0,
                        trainable_mask=None,
                        unsup_loss: Optional[Callable] = None):
    """Supervised (or pretraining) step.

    unsup_loss(outputs, batch) -> scalar is an optional additive term used
    by the unsup pretrainers (ELBO, superpix CE, ...) evaluated on the same
    forward outputs.
    """

    def step(state: TrainState, batch, key):
        images, mask = batch["image"], batch["mask"]

        def loss_of(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            outputs, mut = forward_train(model, variables, images, key)
            loss = sup_loss_fn(criterion, network, outputs, mask,
                               deep_supervision)
            if unsup_loss is not None:
                loss = loss + unsup_loss(outputs, batch)
            return loss, (outputs, mut)

        (loss, (outputs, mut)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        if hebb_alpha:
            grads = merge_hebbian_grads(grads, mut.get("hebb", {}),
                                        hebb_alpha)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if trainable_mask is not None:
            updates = apply_mask(updates, trainable_mask)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params,
            batch_stats=mut.get("batch_stats", state.batch_stats),
            opt_state=opt_state, step=state.step + 1)
        logits = primary_logits(network, outputs)
        return new_state, {"loss": loss, "logits": logits}

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, network: str, criterion=None,
                   needs_rng: bool = False):
    """Inference step returning primary logits (+ loss when criterion)."""

    def step(variables, batch, key=None):
        outputs = forward_eval(model, variables, batch["image"],
                               key if needs_rng else None)
        logits = primary_logits(network, outputs)
        out = {"logits": logits}
        if criterion is not None and "mask" in batch:
            out["loss"] = criterion(logits, batch["mask"])
        return out

    return jax.jit(step)
