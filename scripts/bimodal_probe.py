#!/usr/bin/env python
"""Pretrain-step bimodality probe (VERDICT r3 next-round #7).

The swta_t pretrain step (f32, bs=32, 128^2) compiles to either a
~16.3 ms or a ~20.2 ms binary across recompiles of the IDENTICAL
program (CLAUDE.md round-3 notes).  This probe recompiles the step in
fresh subprocesses N times per XLA-flag configuration and slope-times
each, so flag candidates can be compared for both speed and stability.

Usage:
  python scripts/bimodal_probe.py --reps 5                # default flags
  python scripts/bimodal_probe.py --reps 5 --xla "--xla_tpu_enable_latency_hiding_scheduler=false"
  python scripts/bimodal_probe.py --child                 # (internal)
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child():
    sys.path.insert(0, REPO)
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_sup_train_step
    from hebbax.hebb.spec import HebbSpec
    from hebbax.hebb.surgery import pretrain_trainable_mask
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss
    from hebbax.utils.timing import jitted_init, measure_step

    B, S = 32, 128
    spec = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                    exclude=("out_conv",))
    dtype = (jnp.bfloat16 if os.environ.get("PROBE_DTYPE") == "bfloat16"
             else None)
    model = get_network("unet", 3, 2, hebb=spec, dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    images = jnp.asarray(
        np.random.RandomState(0).rand(B, S, S, 3), jnp.float32)
    masks = jnp.asarray(
        np.random.RandomState(1).randint(0, 2, (B, S, S)), jnp.int32)
    variables = jitted_init(model, rngs, images, train=False)
    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    criterion = segmentation_loss("dice", False, num_classes=2)
    mask = pretrain_trainable_mask(variables["params"], spec.exclude)
    step = make_sup_train_step(model, "unet", criterion, tx,
                               hebb_alpha=1.0, trainable_mask=mask,
                               backprop_only=spec.exclude)
    batch = {"image": images, "mask": masks}
    key = jax.random.PRNGKey(2)
    it = int(os.environ.get("PROBE_ITERS", "100"))
    dt = measure_step(step, state, batch, key, n1=it, n2=3 * it,
                      warmup=10)
    print(json.dumps({"ms": round(dt * 1e3, 2)}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--child", action="store_true")
    p.add_argument("--reps", default=5, type=int)
    p.add_argument("--xla", default="", help="extra XLA_FLAGS")
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()
    if args.child:
        child()
        return
    times = []
    for r in range(args.reps):
        env = dict(os.environ)
        if args.xla:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " "
                                + args.xla).strip()
        env["PROBE_DTYPE"] = args.dtype
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, text=True, env=env, cwd=REPO)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(f"rep {r}: FAILED\n{out.stderr[-1500:]}")
            continue
        ms = json.loads(line[-1])["ms"]
        times.append(ms)
        print(f"rep {r}: {ms} ms", flush=True)
    print(json.dumps({"xla": args.xla, "dtype": args.dtype,
                      "times_ms": times}))


if __name__ == "__main__":
    main()
