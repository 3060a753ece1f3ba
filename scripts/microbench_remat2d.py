#!/usr/bin/env python
"""A/B: conv-saving remat of the 2D sup train step.

The SOL audit (artifacts/r5/sol_audit.log) shows the 2D steps are
bandwidth-bound with 61% of MXU headroom idle, so trading recompute of
the cheap elementwise tails (BN/ReLU/dropout) for NOT round-tripping
their saved activations through HBM may win — the same trade that won
on the 3D CCT shared decoders (*_rc).  Grads are bitwise-identical by
construction (only the save/recompute split changes).

Variants: none | full jax.checkpoint | save_only_these_names(hconv_out).
"""

import os
import sys
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("MB_ITERS", "20"))
NET = os.environ.get("MB_NET", "unet_s2d")
DTYPE = os.environ.get("MB_DTYPE", "bf16")


def main():
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import (forward_train, make_sup_train_step,
                                     sup_loss_fn)
    from hebbax.models import get_network
    from hebbax.models.common import remat_policy
    from hebbax.ops.losses import segmentation_loss
    from hebbax.utils.timing import jitted_init, measure_step

    dtype = jnp.bfloat16 if DTYPE == "bf16" else None
    model = get_network(NET, 3, 2, dtype=dtype)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(32, 128, 128, 3), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, (32, 128, 128)), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = jitted_init(model, rngs, images, train=False)
    tx = optax.sgd(0.5, momentum=0.9)
    criterion = segmentation_loss("dice", False, num_classes=2)
    key = jax.random.PRNGKey(2)
    batch = {"image": images, "mask": masks}

    for mode in (None, "full", "convs"):
        os.environ.pop("HEBBAX_REMAT_STEP", None)
        if mode:
            os.environ["HEBBAX_REMAT_STEP"] = mode
        step = make_sup_train_step(model, NET, criterion, tx)
        # deep-copy: the jitted step donates its state buffers
        v = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                   variables)
        state = TrainState(params=v["params"],
                           batch_stats=v.get("batch_stats"),
                           opt_state=tx.init(v["params"]), step=0)
        compiled = step.lower(state, batch, key).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        dt = measure_step(compiled, state, batch, key,
                          n1=ITERS, n2=3 * ITERS)
        print(f"{NET} {DTYPE} remat={mode}: {dt*1e3:.2f} ms  "
              f"flops={ca.get('flops', 0)/1e9:.0f}G  "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f}GB",
              flush=True)


if __name__ == "__main__":
    main()
