#!/usr/bin/env python
"""Per-process AOT timing of one pretrain-forward variant.

PROFILE_WHICH: fwd_plain | fwd_hebb | deltas_only
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hebbax.engine.steps import forward_train
from hebbax.hebb.spec import HebbSpec
from hebbax.models import get_network

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))


def main():
    which = os.environ.get("PROFILE_WHICH", "fwd_plain")
    spec = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                    exclude=("Conv_1x1",))
    model = get_network("unet", 3, 2, hebb=spec)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(rngs, images, train=False)
    key = jax.random.PRNGKey(2)

    if which == "fwd_plain":
        def fn(v, x):
            return model.apply(v, x, train=False)
    elif which == "fwd_hebb":
        def fn(v, x):
            out, mut = forward_train(model, v, x, key)
            return out, jax.tree_util.tree_map(jnp.sum, mut.get("hebb", {}))
    elif which == "deltas_only":
        def fn(v, x):
            out, mut = forward_train(model, v, x, key)
            return jax.tree_util.tree_map(jnp.sum, mut.get("hebb", {}))
    else:
        raise SystemExit(f"unknown {which}")

    # chained + fetch-forced (see hebbax.utils.timing): the carry is the
    # image, nudged by the output so repeated dispatches can't be elided
    @jax.jit
    def step(imgs, variables):
        out = fn(variables, imgs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        nudge = (1 + 1e-30 * jnp.sum(leaf)).astype(imgs.dtype)
        return imgs * nudge, out

    ca = jax.jit(fn).lower(variables, images).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    from hebbax.utils.timing import measure_step
    dt = measure_step(step, images, variables,
                      n1=ITERS, n2=3 * ITERS) * 1e3
    print(f"{which}: {dt:.3f} ms  flops={ca.get('flops', 0)/1e9:.2f}G  "
          f"bytes={ca.get('bytes accessed', 0)/1e6:.1f}MB", flush=True)


if __name__ == "__main__":
    main()
