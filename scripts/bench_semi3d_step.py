#!/usr/bin/env python
"""Honest (slope-timed) 3D semi-supervised train-step measurement —
the URPC protocol step (train_semi_URPC_3d.py: unet3d_urpc, bs=1,
96x96x80, dice + urpc consistency) for the folded-vs-unfolded backbone
comparison.

Env: SEMI3D_NETS (comma list, default unet3d_urpc,unet3d_urpc_s2d),
SEMI3D_DTYPE (bf16|f32).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hebbax.engine.semi import (cct_unsup, deep4_sup, dtc_sup,
                                dtc_unsup, make_semi_step, urpc_unsup)
from hebbax.engine.state import TrainState
from hebbax.models import get_network
from hebbax.ops.losses import segmentation_loss
from hebbax.utils.timing import jitted_init, measure_step

PATCH = (96, 96, 80)
DTYPE = os.environ.get("SEMI3D_DTYPE", "bf16")
NETS = os.environ.get(
    "SEMI3D_NETS", "unet3d_urpc,unet3d_urpc_s2d").split(",")


def bench(net):
    dty = jnp.bfloat16 if DTYPE == "bf16" else None
    model = get_network(net, 1, 2, dtype=dty)
    rs = np.random.RandomState(0)
    sup_img = jnp.asarray(rs.rand(1, *PATCH, 1), jnp.float32)
    unsup_img = jnp.asarray(rs.rand(1, *PATCH, 1), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, (1,) + PATCH), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = jitted_init(model, rngs, sup_img, train=False)
    criterion = segmentation_loss("dice", False, num_classes=2)
    tx = optax.sgd(0.1, momentum=0.9)
    if "urpc" in net:
        unsup_fn, sup_fn = urpc_unsup, deep4_sup(criterion)
    elif "dtc" in net:
        unsup_fn, sup_fn = dtc_unsup, dtc_sup(criterion)
    else:
        unsup_fn, sup_fn = cct_unsup, deep4_sup(criterion)
    step = make_semi_step(model, net, criterion, tx, unsup_fn, sup_fn)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    sup_batch = {"image": sup_img, "mask": masks}
    if "dtc" in net:  # DTC's sup loss regresses the gt SDF channel
        sup_batch["mask_sdf"] = jnp.asarray(
            rs.rand(1, *PATCH) * 2 - 1, jnp.float32)
    dt = measure_step(step, state, sup_batch,
                      {"image": unsup_img}, jnp.float32(1.0),
                      jax.random.PRNGKey(2), n1=10, n2=30)
    print(f"{net} {DTYPE}: {dt * 1e3:.1f} ms/step "
          f"({2 / dt:.2f} patches/s incl. unsup)", flush=True)
    return dt


def main():
    for net in NETS:
        bench(net)


if __name__ == "__main__":
    main()
