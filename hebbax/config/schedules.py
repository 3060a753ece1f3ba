"""Learning-rate schedules.

The reference wraps ``StepLR(step_size, gamma)`` in a
``GradualWarmupScheduler(multiplier=1, total_epoch=warmup)`` and calls
``.step()`` once per epoch after training
(/root/reference/train_sup_2d.py:187-188,244;
/root/reference/config/warmup_config/warmup.py:5-63).  The effective
per-epoch learning rate, verified empirically against the reference
scheduler, is:

    lr(e) = base * e / warmup                      for e <= warmup
    lr(e) = base * gamma ** ((e - warmup - 1)//step)  for e >  warmup

with ``e`` the 0-indexed epoch being trained (epoch 0 trains at lr = 0, an
artifact of PyTorch schedulers priming on construction that we reproduce
for parity).
"""

import optax


def warmup_step_lr(epoch, base_lr, warmup=20, step_size=50, gamma=0.5):
    """Per-epoch LR as a plain float (host-side use)."""
    if epoch <= warmup:
        return base_lr * epoch / warmup
    return base_lr * gamma ** ((epoch - warmup - 1) // step_size)


def warmup_step_schedule(base_lr, warmup=20, step_size=50, gamma=0.5,
                         steps_per_epoch=1):
    """An ``optax``-compatible schedule over *optimizer steps*.

    ``steps_per_epoch`` converts the step counter into the epoch index so
    the schedule matches the reference's once-per-epoch stepping.
    """

    def schedule(count):
        epoch = count // steps_per_epoch
        import jax.numpy as jnp

        warm = base_lr * jnp.minimum(epoch, warmup) / warmup
        decay_exp = jnp.maximum(epoch - warmup - 1, 0) // step_size
        decayed = base_lr * gamma ** decay_exp.astype(jnp.float32)
        return jnp.where(epoch <= warmup, warm, decayed)

    return schedule


def make_optimizer(name, lr_schedule, momentum=0.9, weight_decay=0.0):
    """SGD(momentum, wd) / Adam factory matching the reference trainers
    (/root/reference/train_sup_2d.py:180-185).

    PyTorch SGD weight decay is L2 added to the gradient *before* momentum;
    ``optax.sgd`` composed with ``add_decayed_weights`` before the momentum
    trace reproduces it.
    """
    if name == "adam":
        return optax.adam(lr_schedule)
    if name == "sgd":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.trace(decay=momentum, nesterov=False))
        parts.append(optax.scale_by_learning_rate(lr_schedule))
        return optax.chain(*parts)
    raise ValueError(f"Optimizer {name!r} not implemented")
