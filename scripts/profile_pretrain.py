#!/usr/bin/env python
"""Profile the Hebbian pretrain step variants on the current backend.

Times (bs=BENCH_BATCH, 128x128, unet, swta_t spec):
  full      - value_and_grad over all params (round-1 behavior)
  head_only - backprop restricted to the excluded head (alpha=1 shortcut)
  fwd_hebb  - forward with delta computation, no backward/optimizer
  fwd_plain - forward without deltas (train=False)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hebbax.engine.state import TrainState
from hebbax.engine.steps import forward_train, make_sup_train_step
from hebbax.hebb.spec import HebbSpec
from hebbax.hebb.surgery import pretrain_trainable_mask
from hebbax.models import get_network
from hebbax.ops.losses import segmentation_loss

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def timeit(fn, *args, iters=ITERS, warmup=2):
    """Fetch-forced chained timing: fn's first arg must be a carry that
    fn returns updated (see hebbax.utils.timing for why plain
    block_until_ready loops are invalid through the axon tunnel)."""
    from hebbax.utils.timing import measure_step
    return measure_step(fn, *args, n1=iters, n2=3 * iters,
                        warmup=warmup) * 1e3


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

    results = {}
    which = os.environ.get("PROFILE_WHICH", "all")

    if which in ("all", "steps"):
        for name, bp in [("full", None), ("head_only", spec.exclude)]:
            step = make_sup_train_step(
                model, "unet", criterion, tx, hebb_alpha=spec.alpha,
                trainable_mask=mask, backprop_only=bp)
            state = fresh_state()

            def run(s):
                s2, out = step(s, batch, key)
                return s2, out["loss"]

            from hebbax.utils.timing import measure_step
            results[name] = measure_step(
                run, state, n1=ITERS, n2=3 * ITERS, warmup=2) * 1e3
            print(f"{name}: {results[name]:.3f} ms", flush=True)

    if which in ("all", "fwd"):
        @jax.jit
        def fwd_hebb(params, bs):
            out, mut = forward_train(
                model, {"params": params, "batch_stats": bs}, images, key)
            deltas = jax.tree_util.tree_leaves(mut.get("hebb", {}))
            return out, [jnp.sum(d) for d in deltas]

        @jax.jit
        def fwd_plain(params, bs):
            return model.apply({"params": params, "batch_stats": bs},
                               images, train=False)

        def chained(fn):
            """Make an argument-invariant forward measurable: thread the
            input image as a carry nudged by the output (the tunnel
            elides repeated identical dispatches)."""
            @jax.jit
            def step(imgs, params, bs):
                out = fn(params, bs, imgs)
                leaf = jax.tree_util.tree_leaves(out)[0]
                nudge = (1 + 1e-30 * jnp.sum(leaf)).astype(imgs.dtype)
                return imgs * nudge, out
            return step

        @functools.partial(jax.jit, static_argnums=())
        def fwd_hebb_img(params, bs, imgs):
            out, mut = model.apply(
                {"params": params, "batch_stats": bs}, imgs, train=True,
                rngs={"dropout": jax.random.PRNGKey(0),
                      "hebb": jax.random.PRNGKey(1)},
                mutable=["batch_stats", "hebb"])
            return out

        def fwd_plain_img(params, bs, imgs):
            return model.apply({"params": params, "batch_stats": bs},
                               imgs, train=False)

        st = fresh_state()
        results["fwd_hebb"] = timeit(chained(fwd_hebb_img), images,
                                     st.params, st.batch_stats)
        print(f"fwd_hebb: {results['fwd_hebb']:.3f} ms", flush=True)
        results["fwd_plain"] = timeit(chained(fwd_plain_img), images,
                                      st.params, st.batch_stats)
        print(f"fwd_plain: {results['fwd_plain']:.3f} ms", flush=True)

    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
