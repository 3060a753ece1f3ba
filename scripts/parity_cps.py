#!/usr/bin/env python
"""CPS semi-supervised accuracy parity control (VERDICT r2 #6).

Runs the reference's OWN CPS training semantics
(/root/reference/train_semi_CPS_2d.py:253-299 reenacted in torch: two
nets, argmax cross pseudo-labels on unlabeled data, unsup_weight ramp
w*(e+1)/E, dice loss, two optimizers) against hebbax's jitted CPS step
(hebbax/engine/semi.py make_cps_step) on the identical synthetic set at
20% labels, identical labeled subset and batch order.  Reports best val
JI/Dice per net per framework.

Usage: python scripts/parity_cps.py [--epochs 20] [--size 64]
"""

import argparse
import json
import os
import sys

import numpy as np

if not os.environ.get("PARITY_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from parity_control import batches, eval_metric, load_module, make_data
from parity_hebbian_cycle import labeled_subset


def torch_cps(arrays, epochs, bs, lr, unsup_weight=1.0, seed=0):
    import torch

    u = load_module("/root/reference/models/networks_2d/unet.py",
                    "ref_unet")
    sys.path.insert(0, "/root/reference")
    from loss.loss_function import segmentation_loss as ref_loss

    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    lab = labeled_subset(len(tr_x))
    unl = np.setdiff1d(np.arange(len(tr_x)), lab)
    criterion = ref_loss("dice", False)
    torch.manual_seed(seed)
    m1 = u.UNet_Transposed_Leaky(3, 2)
    torch.manual_seed(seed + 1)
    m2 = u.UNet_Transposed_Leaky(3, 2)
    o1 = torch.optim.Adam(m1.parameters(), lr=lr)
    o2 = torch.optim.Adam(m2.parameters(), lr=lr)

    def to_nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    best1 = best2 = 0.0
    for epoch in range(epochs):
        w = unsup_weight * (epoch + 1) / epochs
        m1.train(), m2.train()
        unsup_order = [unl[b] for b in batches(len(unl), bs, 5000 + epoch)]
        for i, b in enumerate(batches(len(lab), bs, epoch)):
            ub = unsup_order[i % len(unsup_order)]
            xi = to_nchw(tr_x[ub])
            o1.zero_grad(), o2.zero_grad()
            p1u, p2u = m1(xi), m2(xi)
            pl1 = torch.max(p1u, dim=1)[1].long()
            pl2 = torch.max(p2u, dim=1)[1].long()
            loss_u = (criterion(p1u, pl2.unsqueeze(1))
                      + criterion(p2u, pl1.unsqueeze(1))) * w
            loss_u.backward(retain_graph=True)
            idx = lab[b]
            xs = to_nchw(tr_x[idx])
            ys = torch.from_numpy(tr_y[idx][:, None].astype(np.int64))
            loss_s = criterion(m1(xs), ys) + criterion(m2(xs), ys)
            loss_s.backward()
            o1.step(), o2.step()
        m1.eval(), m2.eval()
        for m, attr in ((m1, "1"), (m2, "2")):
            def fwd(x, m=m):
                with torch.no_grad():
                    out = m(to_nchw(x))
                return np.transpose(out.numpy(), (0, 2, 3, 1))
            d = eval_metric(fwd, va_x, va_y)[2]
            if attr == "1":
                best1 = max(best1, d)
            else:
                best2 = max(best2, d)
    return {"best_val_dice_net1": round(best1, 4),
            "best_val_dice_net2": round(best2, 4)}


def hebbax_cps(arrays, epochs, bs, lr, unsup_weight=1.0, seed=0):
    import jax
    import jax.numpy as jnp
    import optax

    from hebbax.engine.semi import DualState, make_cps_step
    from hebbax.engine.steps import make_eval_step
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss

    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    lab = labeled_subset(len(tr_x))
    unl = np.setdiff1d(np.arange(len(tr_x)), lab)
    criterion = segmentation_loss("dice", False, num_classes=2)
    m1 = get_network("unet", 3, 2)
    m2 = get_network("unet", 3, 2)
    r1 = {"params": jax.random.PRNGKey(seed),
          "dropout": jax.random.PRNGKey(seed + 100)}
    r2 = {"params": jax.random.PRNGKey(seed + 1),
          "dropout": jax.random.PRNGKey(seed + 101)}
    v1 = m1.init(r1, jnp.asarray(tr_x[:1]), train=False)
    v2 = m2.init(r2, jnp.asarray(tr_x[:1]), train=False)
    tx1, tx2 = optax.adam(lr), optax.adam(lr)
    state = DualState(params1=v1["params"],
                      batch_stats1=v1.get("batch_stats"),
                      opt_state1=tx1.init(v1["params"]),
                      params2=v2["params"],
                      batch_stats2=v2.get("batch_stats"),
                      opt_state2=tx2.init(v2["params"]), step=0)
    step = make_cps_step(m1, m2, "unet", criterion, tx1, tx2)
    ev1, ev2 = make_eval_step(m1, "unet"), make_eval_step(m2, "unet")

    best1 = best2 = 0.0
    for epoch in range(epochs):
        w = unsup_weight * (epoch + 1) / epochs
        unsup_order = [unl[b] for b in batches(len(unl), bs, 5000 + epoch)]
        for i, b in enumerate(batches(len(lab), bs, epoch)):
            ub = unsup_order[i % len(unsup_order)]
            idx = lab[b]
            sup = {"image": jnp.asarray(tr_x[idx]),
                   "mask": jnp.asarray(tr_y[idx])}
            uns = {"image": jnp.asarray(tr_x[ub])}
            state, _ = step(state, sup, uns, w,
                            jax.random.PRNGKey(epoch * 1000 + i))
        for which, ev in ((1, ev1), (2, ev2)):
            variables = state.variables(which)

            def fwd(x, ev=ev, variables=variables):
                return np.asarray(ev(variables,
                                     {"image": jnp.asarray(x)})["logits"])

            d = eval_metric(fwd, va_x, va_y)[2]
            if which == 1:
                best1 = max(best1, d)
            else:
                best2 = max(best2, d)
    return {"best_val_dice_net1": round(best1, 4),
            "best_val_dice_net2": round(best2, 4)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", default=20, type=int)
    p.add_argument("--size", default=64, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--unsup_weight", default=1.0, type=float)
    p.add_argument("--out", default="/tmp/parity_cps")
    p.add_argument("--skip_torch", action="store_true")
    args = p.parse_args()

    arrays = make_data(args.out, args.size)
    res = {"config": vars(args)}
    res["hebbax"] = hebbax_cps(arrays, args.epochs, args.batch_size,
                               args.lr, args.unsup_weight)
    if not args.skip_torch:
        res["torch_reference"] = torch_cps(
            arrays, args.epochs, args.batch_size, args.lr,
            args.unsup_weight)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
