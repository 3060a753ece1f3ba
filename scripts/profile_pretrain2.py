#!/usr/bin/env python
"""AOT-compiled timing + cost analysis for the pretrain step variants."""

import os
import sys
import time

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

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))


def main():
    spec = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                    exclude=tuple(os.environ.get("PROFILE_EXCLUDE", "out_conv").split(",")))
    model = get_network("unet", 3, 2, hebb=spec)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, (BATCH, SIZE, SIZE)), jnp.int32)
    variables = model.init(rngs, images, train=False)
    tx = optax.adam(1e-6)
    criterion = segmentation_loss("dice", False, num_classes=2)
    mask = pretrain_trainable_mask(variables["params"], spec.exclude)
    batch = {"image": images, "mask": masks}
    key = jax.random.PRNGKey(2)

    def fresh_state():
        v = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                   variables)
        return TrainState(params=v["params"],
                          batch_stats=v.get("batch_stats"),
                          opt_state=tx.init(v["params"]), step=0)

    order = os.environ.get("PROFILE_ORDER", "head_only,full").split(",")
    for name in order:
        bp = spec.exclude if name == "head_only" else None
        step = make_sup_train_step(
            model, "unet", criterion, tx, hebb_alpha=spec.alpha,
            trainable_mask=mask, backprop_only=bp)
        state = fresh_state()
        lowered = step.lower(state, batch, key)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        from hebbax.utils.timing import measure_step
        dt = measure_step(compiled, state, batch, key,
                          n1=ITERS, n2=3 * ITERS) * 1e3
        print(f"{name}: {dt:.3f} ms  "
              f"flops={flops/1e9:.2f}G  bytes={bytes_/1e6:.1f}MB",
              flush=True)


def profile_trace():
    """Capture a jax.profiler trace of the head_only step."""
    import glob
    spec = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                    exclude=tuple(os.environ.get("PROFILE_EXCLUDE", "out_conv").split(",")))
    model = get_network("unet", 3, 2, hebb=spec)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, (BATCH, SIZE, SIZE)), jnp.int32)
    variables = model.init(rngs, images, train=False)
    tx = optax.adam(1e-6)
    criterion = segmentation_loss("dice", False, num_classes=2)
    mask = pretrain_trainable_mask(variables["params"], spec.exclude)
    batch = {"image": images, "mask": masks}
    key = jax.random.PRNGKey(2)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    step = make_sup_train_step(
        model, "unet", criterion, tx, hebb_alpha=spec.alpha,
        trainable_mask=mask, backprop_only=spec.exclude)
    s = state
    for _ in range(3):
        s, out = step(s, batch, key)
    jax.block_until_ready(out["loss"])
    outdir = "/tmp/hebbax_trace"
    with jax.profiler.trace(outdir):
        for _ in range(5):
            s, out = step(s, batch, key)
        jax.block_until_ready(out["loss"])
    print("trace files:", glob.glob(outdir + "/**/*", recursive=True)[:20])


if os.environ.get("PROFILE_TRACE"):
    main = profile_trace


if __name__ == "__main__":
    main()
