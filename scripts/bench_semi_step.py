#!/usr/bin/env python
"""Honest (slope-timed) semi-supervised train-step measurement for the
CCT/URPC family, used to compare the folded backbones and the 4N-batched
CCT decoder variant (reference contract:
/root/reference/models/networks_2d/unet_cct.py:212-267).

Env: SEMI_NETS (comma list, default unet_cct_s2d,unet_cct_s2d_batched),
SEMI_DTYPE (bf16|f32), BENCH_BATCH, BENCH_SIZE.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hebbax.engine.semi import cct_unsup, deep4_sup, make_semi_step, urpc_unsup
from hebbax.engine.state import TrainState
from hebbax.models import get_network
from hebbax.ops.losses import segmentation_loss
from hebbax.utils.timing import measure_step
from hebbax.utils.timing import jitted_init

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "128"))
DTYPE = os.environ.get("SEMI_DTYPE", "bf16")
NETS = os.environ.get(
    "SEMI_NETS", "unet_cct_s2d,unet_cct_s2d_batched").split(",")


def bench(net):
    dty = jnp.bfloat16 if DTYPE == "bf16" else None
    model = get_network(net, 3, 2, dtype=dty)
    rs = np.random.RandomState(0)
    sup_img = jnp.asarray(rs.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    unsup_img = jnp.asarray(rs.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, (BATCH, SIZE, SIZE)), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = jitted_init(model, rngs, sup_img, train=False)
    criterion = segmentation_loss("dice", False, num_classes=2)
    tx = optax.sgd(0.5, momentum=0.9)
    unsup_fn = urpc_unsup if "urpc" in net else cct_unsup
    step = make_semi_step(model, net, criterion, tx, unsup_fn,
                          deep4_sup(criterion))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    sup_batch = {"image": sup_img, "mask": masks}
    unsup_batch = {"image": unsup_img}
    key = jax.random.PRNGKey(2)
    dt = measure_step(step, state, sup_batch, unsup_batch,
                      jnp.float32(1.0), key, n1=10, n2=30)
    print(f"{net} {DTYPE}: {dt * 1e3:.1f} ms/step "
          f"({2 * BATCH / dt:.0f} img/s incl. unsup)", flush=True)
    return dt


def main():
    for net in NETS:
        bench(net)


if __name__ == "__main__":
    main()
