#!/usr/bin/env python
"""Capture a jax.profiler trace of a 3D train step and print the per-op
device-time breakdown (trace op durations are the RELIABLE timing source
through the axon tunnel — see CLAUDE.md).

Env: TRACE_NET (unet3d|unet3d_s2d|vnet|...), TRACE_DTYPE (f32|bf16),
TRACE_PATCH (default 96,96,80), TRACE_BATCH (default 1).
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hebbax.engine.state import TrainState
from hebbax.engine.steps import make_sup_train_step
from hebbax.models import get_network
from hebbax.ops.losses import segmentation_loss

NET = os.environ.get("TRACE_NET", "unet3d")
DTYPE = os.environ.get("TRACE_DTYPE", "bf16")
PATCH = tuple(int(x) for x in os.environ.get(
    "TRACE_PATCH", "96,96,80").split(","))
BATCH = int(os.environ.get("TRACE_BATCH", "1"))
OUT = os.environ.get("TRACE_DIR", "/tmp/hebbax_trace_step3d")
REPS = 5


def main():
    dty = jnp.bfloat16 if DTYPE == "bf16" else None
    model = get_network(NET, 1, 2, dtype=dty)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(BATCH, *PATCH, 1), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, (BATCH,) + PATCH), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, images, train=False)
    criterion = segmentation_loss("dice", False, num_classes=2)
    tx = optax.sgd(0.1, momentum=0.9)
    step = make_sup_train_step(model, NET, criterion, tx)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    batch = {"image": images, "mask": masks}
    key = jax.random.PRNGKey(2)
    s = state
    for _ in range(3):
        s, out = step(s, batch, key)
    np.asarray(out["loss"])
    with jax.profiler.trace(OUT):
        for _ in range(REPS):
            s, out = step(s, batch, key)
        np.asarray(out["loss"])

    tr_file = sorted(glob.glob(OUT + "/**/*.trace.json.gz",
                               recursive=True))[-1]
    with gzip.open(tr_file) as f:
        tr = json.load(f)
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and e.get("args")
          and e["args"].get("hlo_category")]
    bycat = collections.Counter()
    byop = collections.Counter()
    for e in ev:
        d = e.get("dur", 0)
        bycat[e["args"]["hlo_category"]] += d
        byop[e["args"].get("tf_op", e["name"])[:110]] += d
    tot = sum(bycat.values())
    div = 1000.0 * REPS
    print(f"== {NET} {DTYPE} {PATCH} bs{BATCH}: device total "
          f"{tot/div:.3f} ms/step")
    print("-- by category (ms/step)")
    for k, v in bycat.most_common():
        print(f"  {v/div:8.3f}  {k}")
    print("-- by tf_op (top 30)")
    for k, v in byop.most_common(30):
        print(f"  {v/div:8.3f}  {k}")


if __name__ == "__main__":
    main()
