#!/usr/bin/env python
"""Capture a jax.profiler trace of a train step and print the per-op
device-time breakdown (the trace op durations are the RELIABLE timing
source through the axon tunnel — see CLAUDE.md).

Env: TRACE_NET (unet|unet_s2d|...), TRACE_MODE (sup|pretrain),
TRACE_DTYPE (f32|bf16), BENCH_BATCH/BENCH_SIZE.
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
from hebbax.hebb.spec import HebbSpec
from hebbax.hebb.surgery import pretrain_trainable_mask
from hebbax.models import get_network
from hebbax.ops.losses import segmentation_loss
from hebbax.utils.timing import jitted_init

NET = os.environ.get("TRACE_NET", "unet_s2d")
MODE = os.environ.get("TRACE_MODE", "sup")
DTYPE = os.environ.get("TRACE_DTYPE", "bf16")
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "128"))
OUT = os.environ.get("TRACE_DIR", "/tmp/hebbax_trace_step")


def main():
    dty = jnp.bfloat16 if DTYPE == "bf16" else None
    spec = (None if MODE == "sup" else
            HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                     exclude=("out_conv",)))
    model = get_network(NET, 3, 2, hebb=spec, dtype=dty)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, (BATCH, SIZE, SIZE)), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = jitted_init(model, rngs, images, train=False)
    criterion = segmentation_loss("dice", False, num_classes=2)
    tx = optax.sgd(0.5, momentum=0.9) if MODE == "sup" else optax.adam(1e-3)
    kw = {}
    if spec is not None:
        kw = dict(hebb_alpha=1.0,
                  trainable_mask=pretrain_trainable_mask(
                      variables["params"], spec.exclude),
                  backprop_only=spec.exclude)
    step = make_sup_train_step(model, NET if NET != "unet_s2d" else "unet",
                               criterion, tx, **kw)
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
        for _ in range(5):
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
    bysrc = collections.Counter()
    byop = collections.Counter()
    for e in ev:
        d = e.get("dur", 0)
        bycat[e["args"]["hlo_category"]] += d
        bysrc[e["args"].get("source", "?")] += d
        byop[e["args"].get("tf_op", e["name"])[:90]] += d
    tot = sum(bycat.values())
    print(f"== {NET} {MODE} {DTYPE}: device total {tot/5000:.3f} ms/step")
    print("-- by category (ms/step)")
    for k, v in bycat.most_common():
        print(f"  {v/5000:8.3f}  {k}")
    print("-- by source (top 15)")
    for k, v in bysrc.most_common(15):
        print(f"  {v/5000:8.3f}  {k}")
    print("-- by tf_op (top 20)")
    for k, v in byop.most_common(20):
        print(f"  {v/5000:8.3f}  {k}")


if __name__ == "__main__":
    main()
