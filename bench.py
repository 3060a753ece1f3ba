#!/usr/bin/env python
"""Benchmark: GlaS 2D supervised train-step throughput (the reference's
headline config: UNet 128x128, dice loss, SGD — train_sup_2d.py defaults).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the PyTorch reference model executing the
identical train step on this host (the reference has no published
numbers — BASELINE.md), at the same batch size.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "128"))
WARMUP = 3
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
DTYPE = os.environ.get("BENCH_DTYPE", "float32")  # float32 | bfloat16


def bench_hebbax():
    import jax
    import jax.numpy as jnp
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_sup_train_step
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss

    dtype = jnp.bfloat16 if DTYPE in ("bfloat16", "bf16") else None
    model = get_network("unet", 3, 2, dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    images = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    masks = jnp.asarray(
        np.random.RandomState(1).randint(0, 2, (BATCH, SIZE, SIZE)),
        jnp.int32)
    variables = model.init(rngs, images, train=False)
    tx = optax.sgd(0.5, momentum=0.9)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    criterion = segmentation_loss("dice", False, num_classes=2)
    step = make_sup_train_step(model, "unet", criterion, tx)
    batch = {"image": images, "mask": masks}
    key = jax.random.PRNGKey(2)
    for _ in range(WARMUP):
        state, out = step(state, batch, key)
    jax.block_until_ready(out["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, out = step(state, batch, key)
    jax.block_until_ready(out["loss"])
    dt = time.perf_counter() - t0
    return ITERS / dt, ITERS * BATCH / dt


def bench_torch_reference():
    """The reference's UNet_Transposed_Leaky train step (dice loss, SGD) on
    this host's torch backend."""
    try:
        import importlib.util

        import torch

        def load(path, name):
            spec = importlib.util.spec_from_file_location(name, path)
            m = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(m)
            return m

        ref = "/root/reference"
        u = load(os.path.join(ref, "models/networks_2d/unet.py"), "ref_unet")
        sys.path.insert(0, ref)
        from loss.loss_function import segmentation_loss as ref_loss

        device = "cuda" if torch.cuda.is_available() else "cpu"
        model = u.UNet_Transposed_Leaky(3, 2).to(device).train()
        criterion = ref_loss("dice", False)
        opt = torch.optim.SGD(model.parameters(), lr=0.5, momentum=0.9)
        x = torch.rand(BATCH, 3, SIZE, SIZE, device=device)
        y = torch.randint(0, 2, (BATCH, 1, SIZE, SIZE), device=device)
        iters = max(3, ITERS // 4)
        for _ in range(2):
            opt.zero_grad()
            loss = criterion(model(x), y)
            loss.backward()
            opt.step()
        if device == "cuda":
            torch.cuda.synchronize()
        t0 = time.perf_counter()
        for _ in range(iters):
            opt.zero_grad()
            loss = criterion(model(x), y)
            loss.backward()
            opt.step()
        if device == "cuda":
            torch.cuda.synchronize()
        dt = time.perf_counter() - t0
        return iters / dt
    except Exception:
        return None


def main():
    steps_per_sec, images_per_sec = bench_hebbax()
    baseline = bench_torch_reference()
    vs = steps_per_sec / baseline if baseline else None
    print(json.dumps({
        "metric": "glas2d_unet_train_images_per_sec",
        "value": round(images_per_sec, 2),
        "unit": f"images/s (bs={BATCH}, {SIZE}x{SIZE})",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
