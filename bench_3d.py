#!/usr/bin/env python
"""3D benchmarks (the BASELINE.md north-star 'LA volumes/sec'):
unet3d train-step throughput at the reference config (96,96,80) bs=1 and
sliding-window inference volumes/sec on a synthetic LA-sized volume
((240,160,96), patch (96,96,80), overlap (48,48,40)).

Prints one JSON line per metric.
"""

import json
import os
import time

import numpy as np

VOL_SHAPE = tuple(int(x) for x in os.environ.get(
    "BENCH3D_VOL", "240,160,96").split(","))
PATCH = (96, 96, 80)
OVERLAP = (48, 48, 40)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from hebbax.engine.sliding import (grid_locations,
                                       slide_window_inference_device)
    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_sup_train_step
    from hebbax.models import get_network, primary_logits
    from hebbax.ops.losses import segmentation_loss

    model = get_network("unet3d", 1, 2)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    img = jnp.asarray(np.random.RandomState(0).rand(1, *PATCH, 1),
                      jnp.float32)
    msk = jnp.asarray(np.random.RandomState(1).randint(
        0, 2, (1,) + PATCH), jnp.int32)
    variables = model.init(rngs, img, train=False)

    # train step (skip with BENCH3D_SKIP_TRAIN=1 — each compile costs
    # minutes through the axon tunnel, so run the two metrics separately)
    skip_train = bool(os.environ.get("BENCH3D_SKIP_TRAIN"))
    tx = optax.sgd(0.1, momentum=0.9)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    criterion = segmentation_loss("dice", False, num_classes=2)
    if not skip_train:
        step = make_sup_train_step(model, "unet3d", criterion, tx)
        batch = {"image": img, "mask": msk}
        key = jax.random.PRNGKey(2)
        for _ in range(3):
            state, out = step(state, batch, key)
        jax.block_until_ready(out["loss"])
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, out = step(state, batch, key)
        jax.block_until_ready(out["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps(
            {"metric": "atrial3d_unet3d_train_patches_per_sec",
             "value": round(1 / dt, 2),
             "unit": "patches/s (bs=1, 96x96x80)",
             "vs_baseline": None}), flush=True)
    if os.environ.get("BENCH3D_SKIP_INFER"):
        return

    # sliding-window inference — the train step donated the original
    # variables, so rebuild them from the final train state; variables
    # are threaded as slider args (not closure constants)
    bs = 4
    inf_vars = {"params": state.params}
    if state.batch_stats is not None:
        inf_vars["batch_stats"] = state.batch_stats

    def forward(patches, vs):
        return primary_logits(
            "unet3d", model.apply(vs, patches, train=False))

    vol = np.random.RandomState(2).rand(*VOL_SHAPE).astype(np.float32)
    n_patches = len(grid_locations(VOL_SHAPE, PATCH, OVERLAP))
    # warm up the compile (device-resident slider: one dispatch/volume)
    slide_window_inference_device(forward, vol, PATCH, OVERLAP, 2,
                                  batch_size=bs, fwd_args=(inf_vars,))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        slide_window_inference_device(forward, vol, PATCH, OVERLAP, 2,
                                      batch_size=bs,
                                      fwd_args=(inf_vars,))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"metric": "atrial3d_sliding_window_volumes_per_sec",
                      "value": round(1 / dt, 3),
                      "unit": f"volumes/s ({VOL_SHAPE}, {n_patches} "
                              f"patches, bs={bs})",
                      "vs_baseline": None}))


if __name__ == "__main__":
    main()
