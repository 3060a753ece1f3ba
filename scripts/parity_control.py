#!/usr/bin/env python
"""Accuracy-parity control run (SURVEY.md section 6 north-star).

Trains the PyTorch REFERENCE (UNet_Transposed_Leaky + its own dice loss,
/root/reference/train_sup_2d.py:207-242 reenacted on this host's torch —
the script itself hard-requires CUDA and albumentations) and hebbax on
the IDENTICAL synthetic dataset, identical decoded/normalized arrays,
identical fixed batch order, identical optimizer config, and evaluates
both with the IDENTICAL metric (hebbax's streaming 45-threshold sweep),
then reports both val JI/Dice trajectories.

Augmentation is disabled on both sides so the data stream is bitwise
identical; initializations differ (each framework's own init), so the
comparison is converged-accuracy parity, not per-step equality.

Usage:  JAX_PLATFORMS=cpu python scripts/parity_control.py \
            [--epochs 20] [--size 64] [--out /tmp/parity_control]
Prints one JSON document with both trajectories and the final numbers.
"""

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

# The axon sitecustomize force-overrides JAX_PLATFORMS, so pin the CPU
# backend through jax.config (the only effective route — see
# tests/conftest.py).  PARITY_TPU=1 opts back into the tunnel device.
if not os.environ.get("PARITY_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def make_data(out, size, n_train=32, n_val=16, seed=0, kind="blob",
              **genkw):
    """genkw (e.g. noise=, period= for kind='texture') forwards to the
    generator — callers must key `out` by those values, since an
    existing dir is reused as-is."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_synth_data
    if not os.path.exists(os.path.join(out, "train", "image")):
        gen = {"texture": make_synth_data.make_2d_texture,
               "palette": make_synth_data.make_2d_palette}.get(
            kind, make_synth_data.make_2d)
        gen(out, n_train, n_val, size, seed=seed, **genkw)

    from hebbax.config.datasets import dataset_cfg
    from hebbax.data.dataset2d import SegDataset2D as Dataset2D
    cfg = dataset_cfg("GlaS")
    arrays = {}
    for split in ("train", "val"):
        ds = Dataset2D(os.path.join(out, split), "image", cfg["MEAN"],
                       cfg["STD"], split=split, size=(size, size))
        ds.host_augment = False  # resize+normalize only: identical stream
        items = [ds.get(i) for i in range(len(ds))]
        arrays[split] = (
            np.stack([it["image"] for it in items]).astype(np.float32),
            np.stack([it["mask"] for it in items]).astype(np.int32))
    return arrays


def batches(n, bs, epoch):
    """Fixed deterministic order, same for both frameworks."""
    idx = np.random.RandomState(1000 + epoch).permutation(n)
    for s in range(0, n - bs + 1, bs):
        yield idx[s:s + bs]


def eval_metric(logits_fn, val_x, val_y, bs=8):
    """hebbax's streaming 45-threshold sweep on any framework's logits."""
    from hebbax.ops.metrics import make_accumulator
    acc = make_accumulator(2)
    for s in range(0, len(val_x), bs):
        logits = logits_fn(val_x[s:s + bs])  # (B, H, W, 2) channels-last
        acc.update(logits, val_y[s:s + bs])
    thr, ji, dc = acc.finalize()
    return float(thr), float(ji), float(dc)


def run_hebbax(arrays, epochs, bs, lr, seed=0, network="unet",
               dtype=None, protocol="fixed_adam"):
    import jax
    import jax.numpy as jnp
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_eval_step, make_sup_train_step
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss

    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    dty = jnp.bfloat16 if dtype in ("bfloat16", "bf16") else None
    model = get_network(network, 3, 2, dtype=dty)
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1)}
    variables = model.init(rngs, jnp.asarray(tr_x[:1]), train=False)
    if protocol == "reference":
        # train_sup_2d.py:180-188: SGD lr 0.5 momentum 0.9 wd 5e-5,
        # 20-epoch warmup + StepLR(50, 0.5) stepped once per epoch
        from hebbax.config.schedules import (make_optimizer,
                                             warmup_step_schedule)
        n_steps = max(1, len(tr_x) // bs)
        sched = warmup_step_schedule(lr, warmup=20, step_size=50,
                                     gamma=0.5, steps_per_epoch=n_steps)
        tx = make_optimizer("sgd", sched, momentum=0.9,
                            weight_decay=5e-5)
    else:
        tx = optax.adam(lr)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    criterion = segmentation_loss("dice", False, num_classes=2)
    step = make_sup_train_step(model, "unet", criterion, tx)
    eval_step = make_eval_step(model, "unet")  # outputs="single" either way

    traj = []
    for epoch in range(epochs):
        for i, b in enumerate(batches(len(tr_x), bs, epoch)):
            batch = {"image": jnp.asarray(tr_x[b]),
                     "mask": jnp.asarray(tr_y[b])}
            state, out = step(state, batch,
                              jax.random.PRNGKey(epoch * 1000 + i))
        variables = state.variables

        def fwd(x):
            return np.asarray(
                eval_step(variables, {"image": jnp.asarray(x)})["logits"])

        traj.append(eval_metric(fwd, va_x, va_y))
    return traj


def run_torch_reference(arrays, epochs, bs, lr, seed=0,
                        protocol="fixed_adam"):
    import torch

    u = load_module(os.path.join("/root/reference",
                                 "models/networks_2d/unet.py"), "ref_unet")
    sys.path.insert(0, "/root/reference")
    from loss.loss_function import segmentation_loss as ref_loss

    torch.manual_seed(seed)
    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    model = u.UNet_Transposed_Leaky(3, 2).train()
    criterion = ref_loss("dice", False)
    sched = None
    if protocol == "reference":
        # the reference's own optimizer + vendored warmup scheduler
        # (train_sup_2d.py:180-188, stepped once per epoch at :244)
        from torch.optim import lr_scheduler

        from config.warmup_config.warmup import GradualWarmupScheduler
        opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=0.9,
                              weight_decay=5e-5)
        after = lr_scheduler.StepLR(opt, step_size=50, gamma=0.5)
        sched = GradualWarmupScheduler(opt, multiplier=1.0,
                                       total_epoch=20,
                                       after_scheduler=after)
    else:
        opt = torch.optim.Adam(model.parameters(), lr=lr)

    def to_nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    traj = []
    for epoch in range(epochs):
        model.train()
        for b in batches(len(tr_x), bs, epoch):
            opt.zero_grad()
            out = model(to_nchw(tr_x[b]))
            loss = criterion(out, torch.from_numpy(
                tr_y[b][:, None].astype(np.int64)))
            loss.backward()
            opt.step()
        if sched is not None:
            sched.step()
        model.eval()

        def fwd(x):
            with torch.no_grad():
                out = model(to_nchw(x))
            return np.transpose(out.numpy(), (0, 2, 3, 1))

        traj.append(eval_metric(fwd, va_x, va_y))
    return traj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", default=20, type=int)
    p.add_argument("--size", default=64, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--out", default="/tmp/parity_control")
    p.add_argument("--network", default="unet",
                   help="hebbax network (e.g. unet_s2d for the folded "
                        "TPU fast path; checkpoints interchangeable)")
    p.add_argument("--dtype", default="float32",
                   help="hebbax compute dtype (float32 | bfloat16)")
    p.add_argument("--protocol", default="fixed_adam",
                   choices=["fixed_adam", "reference"],
                   help="'reference' = train_sup_2d.py:180-188 exact "
                        "config (SGD lr 0.5 + warmup 20 + StepLR(50,.5) "
                        "+ wd 5e-5); pass --lr 0.5 with it")
    p.add_argument("--reference_best", type=float, default=None,
                   help="skip the (slow) torch control and compare "
                        "against this stored best val Dice")
    args = p.parse_args()

    arrays = make_data(args.out, args.size)
    if args.reference_best is None:
        ref = run_torch_reference(arrays, args.epochs, args.batch_size,
                                  args.lr, protocol=args.protocol)
    else:
        ref = [(0.5, args.reference_best, args.reference_best)]
    heb = run_hebbax(arrays, args.epochs, args.batch_size, args.lr,
                     network=args.network, dtype=args.dtype,
                     protocol=args.protocol)
    best_ref = max(t[2] for t in ref)
    best_heb = max(t[2] for t in heb)
    print(json.dumps({
        "config": {"epochs": args.epochs, "size": args.size,
                   "batch_size": args.batch_size, "lr": args.lr,
                   "network": args.network, "dtype": args.dtype,
                   "protocol": args.protocol},
        "reference_val_thr_ji_dice_per_epoch": ref,
        "hebbax_val_thr_ji_dice_per_epoch": heb,
        "best_val_dice": {"reference": round(best_ref, 4),
                          "hebbax": round(best_heb, 4),
                          "abs_diff": round(abs(best_ref - best_heb), 4)},
    }, indent=1))


if __name__ == "__main__":
    main()
