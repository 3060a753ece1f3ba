"""Exponential moving average of parameter pytrees.

Matches update_ema_variables (/root/reference/utils.py:557-562):
``alpha = min(1 - 1/(step+1), decay); ema = alpha*ema + (1-alpha)*param``.
Pure function over pytrees, usable inside a jitted train step.
"""

import jax
import jax.numpy as jnp


def update_ema(ema_params, params, decay, global_step):
    alpha = jnp.minimum(1.0 - 1.0 / (global_step + 1.0), decay)
    return jax.tree_util.tree_map(
        lambda e, p: alpha * e + (1.0 - alpha) * p, ema_params, params)
