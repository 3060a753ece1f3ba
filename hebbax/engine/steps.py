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

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..hebb.surgery import apply_mask, merge_hebbian_grads
from ..models.registry import primary_logits
from .state import TrainState


def _model_rngs(key, extra=()):
    names = ("dropout", "hebb", "perturb", "latent", "poisson")
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
                        unsup_loss: Optional[Callable] = None,
                        backprop_only=None):
    """Supervised (or pretraining) step.

    unsup_loss(outputs, batch) -> scalar is an optional additive term used
    by the unsup pretrainers (ELBO, superpix CE, ...) evaluated on the same
    forward outputs.

    backprop_only: optional tuple of module-path prefixes (the Hebbian
    ``exclude`` head names).  When set, the backward pass differentiates
    ONLY the parameters under those modules.  Mathematically identical to
    the full backward at hebb_alpha=1 — every converted kernel's backprop
    grad is scaled by (1-alpha)=0 and the rest is masked — but XLA then
    dead-code-eliminates the whole trunk backward (the reference pays it:
    HebbianConv weights keep requires_grad=True through pretraining,
    /root/reference/pretrain_hebbian_unsup_2d.py:188-195).
    """
    from flax import traverse_util

    from ..hebb.spec import is_excluded

    # HEBBAX_REMAT_STEP: ""/unset (off) | "convs" | "full".  Wraps the
    # whole loss closure in jax.checkpoint; "convs" uses the conv-saving
    # policy (models/common.remat_policy) so the backward recomputes only
    # the elementwise tails instead of round-tripping their activations
    # through HBM.  Grads are identical either way (only the
    # save/recompute split changes); measured A/B in
    # scripts/microbench_remat2d.py.  Read at factory time so tests/
    # benches can flip it per-step-build.
    import os as _os

    from ..models.common import remat_policy as _remat_policy
    _remat = _os.environ.get("HEBBAX_REMAT_STEP", "")

    def step(state: TrainState, batch, key):
        images, mask = batch["image"], batch["mask"]

        def run(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            outputs, mut = forward_train(model, variables, images, key)
            loss = sup_loss_fn(criterion, network, outputs, mask,
                               deep_supervision)
            if unsup_loss is not None:
                loss = loss + unsup_loss(outputs, batch)
            return loss, (outputs, mut)

        if _remat:
            run = jax.checkpoint(
                run, policy=_remat_policy(
                    "convs" if _remat == "convs" else None))

        if backprop_only:
            flat = traverse_util.flatten_dict(state.params)
            head_paths = [p for p in flat
                          if is_excluded(p[:-1], tuple(backprop_only))]

            def loss_of(head_flat):
                merged = dict(flat)
                merged.update(head_flat)
                return run(traverse_util.unflatten_dict(merged))

            (loss, (outputs, mut)), g_head = jax.value_and_grad(
                loss_of, has_aux=True)({p: flat[p] for p in head_paths})
            g_flat = {p: (g_head[p] if p in g_head
                          else jnp.zeros_like(v))
                      for p, v in flat.items()}
            grads = traverse_util.unflatten_dict(g_flat)
        else:
            (loss, (outputs, mut)), grads = jax.value_and_grad(
                run, has_aux=True)(state.params)
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


def head_only_mask(params, head_names):
    """Boolean pytree: True only under the probe-head modules."""
    from flax import traverse_util

    from ..hebb.spec import is_excluded
    flat = traverse_util.flatten_dict(params)
    mask = {p: is_excluded(p[:-1], tuple(head_names)) for p in flat}
    return traverse_util.unflatten_dict(mask)


def make_probe_pretrain_step(model, network: str, criterion, tx,
                             unsup_loss, head_names=("out_conv",),
                             forward=None):
    """Unsupervised pretraining with a supervised linear-probe head.

    Replicates the reference's reset_internal_grads protocol
    (pretrain_vae_unsup_2d.py:175-183, pretrain_superpix_unsup_2d.py:
    177-180): probe segm grads reach ONLY the head modules; the rest of
    the network learns from the unsupervised objective alone.

      grads = grad(unsup) + restrict_to_head(grad(probe))

    computed with one forward + two backward passes via jax.vjp.

    unsup_loss(outputs, batch) -> scalar.  forward overrides the model
    application (signature (variables, batch, key, train) ->
    (outputs, mutated)) for exotic forwards like diffusion.
    """
    if forward is None:
        def forward(variables, batch, key, train=True):
            return model.apply(variables, batch["image"], train=train,
                               rngs=_model_rngs(key),
                               mutable=["batch_stats", "hebb"])

    def step(state: TrainState, batch, key):
        from flax import traverse_util
        head_mask = head_only_mask(state.params, head_names)

        def losses_of(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            outputs, mut = forward(variables, batch, key)
            probe = criterion(primary_logits(network, outputs),
                              batch["mask"])
            unsup = unsup_loss(outputs, batch)
            return (probe, unsup), (outputs, mut)

        (probe_loss, unsup), pull, (outputs, mut) = jax.vjp(
            losses_of, state.params, has_aux=True)
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        g_probe = pull((one, zero))[0]
        g_unsup = pull((zero, one))[0]
        fu = traverse_util.flatten_dict(g_unsup)
        fp = traverse_util.flatten_dict(g_probe)
        fm = traverse_util.flatten_dict(head_mask)
        merged = {p: fu[p] + fp[p] if fm[p] else fu[p] for p in fu}
        grads = traverse_util.unflatten_dict(merged)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params,
            batch_stats=mut.get("batch_stats", state.batch_stats),
            opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": probe_loss, "loss_unsup": unsup,
                           "logits": primary_logits(network, outputs)}

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
