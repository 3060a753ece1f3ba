#!/usr/bin/env python
"""Bootstrap-advantage protocol exploration (VERDICT r3 next-round #2).

Finds WHERE the Hebbian bootstrap advantage lives on the texture
dataset: pretrains once per inv-temp K, then fine-tunes from each
pretrained snapshot AND from random init, recording the FULL per-epoch
val-Dice curves.  Advantage-at-epoch-e for every (K, e) is then
computable offline — no protocol guess has to be re-run.

Usage:
  python scripts/explore_bootstrap.py --framework hebbax \
      [--ks 5 20 50] [--label_frac 0.05] [--seed 0] [--out /tmp/exp.json]
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
from parity_hebbian_cycle import EXCLUDE, labeled_subset


# --------------------------------------------------------------- hebbax
def hebbax_explore(arrays, args):
    import jax
    import jax.numpy as jnp
    import optax

    from hebbax.cli.common import reinit_excluded
    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_eval_step, make_sup_train_step
    from hebbax.hebb.spec import HebbSpec
    from hebbax.hebb.surgery import pretrain_trainable_mask
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss

    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    lab = labeled_subset(len(tr_x), args.label_frac)
    criterion = segmentation_loss("dice", False, num_classes=2)
    seed, bs, lr = args.seed, args.batch_size, args.lr

    def train_curve(model, variables, tx, step, xs, ys, epochs,
                    lab_idx=None, keep_best=False):
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats"),
                           opt_state=tx.init(variables["params"]), step=0)
        eval_step = make_eval_step(model, "unet")
        curve, best, best_state = [], 0.0, None
        n = len(xs) if lab_idx is None else len(lab_idx)
        bs_eff = min(bs, n)
        for epoch in range(epochs):
            for i, b in enumerate(batches(n, bs_eff, epoch)):
                idx = b if lab_idx is None else lab_idx[b]
                batch = {"image": jnp.asarray(xs[idx]),
                         "mask": jnp.asarray(ys[idx])}
                state, _ = step(state, batch, jax.random.fold_in(
                    jax.random.PRNGKey(seed), epoch * 1000 + i))
            variables_e = state.variables

            def fwd(x):
                return np.asarray(eval_step(
                    variables_e, {"image": jnp.asarray(x)})["logits"])

            d = eval_metric(fwd, va_x, va_y)[2]
            curve.append(round(float(d), 4))
            if keep_best and d > best:
                best, best_state = d, jax.tree_util.tree_map(
                    np.asarray, variables_e)
        return curve, best_state

    res = {"ft_from_k": {}, "pretrain_probe": {}}

    def finetune_from(pre_vars, tag):
        spec0 = HebbSpec(mode=args.hebb_mode, k=50.0, w_nrm=True, alpha=0.0,
                         exclude=tuple(EXCLUDE))
        ft_model = get_network("unet", 3, 2, hebb=spec0)
        rngs_ft = {"params": jax.random.PRNGKey(seed + 10),
                   "dropout": jax.random.PRNGKey(seed + 11)}
        fresh = ft_model.init(rngs_ft, jnp.asarray(tr_x[:1]), train=False)
        ft_vars = dict(fresh)
        ft_vars["params"] = reinit_excluded(
            pre_vars["params"], fresh["params"], spec0.exclude)
        if "batch_stats" in pre_vars:
            ft_vars["batch_stats"] = pre_vars["batch_stats"]
        tx_ft = optax.adam(args.ft_lr)
        step_ft = make_sup_train_step(ft_model, "unet", criterion, tx_ft)
        curve, _ = train_curve(ft_model, ft_vars, tx_ft, step_ft,
                               tr_x, tr_y, args.ft_epochs, lab_idx=lab)
        print(f"# hebbax ft-from-{tag}: {curve}", flush=True)
        return curve

    for k in args.ks:
        spec = HebbSpec(mode=args.hebb_mode, k=float(k), w_nrm=True,
                        alpha=1.0,
                        exclude=tuple(EXCLUDE))
        model = get_network("unet", 3, 2, hebb=spec)
        rngs = {"params": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(seed + 1)}
        variables = model.init(rngs, jnp.asarray(tr_x[:1]), train=False)
        tx = optax.adam(lr)
        mask = pretrain_trainable_mask(variables["params"], spec.exclude)
        step = make_sup_train_step(model, "unet", criterion, tx,
                                   hebb_alpha=1.0, trainable_mask=mask,
                                   backprop_only=spec.exclude)
        curve, pre_vars = train_curve(model, variables, tx, step,
                                      tr_x, tr_y, args.pre_epochs,
                                      keep_best=True)
        print(f"# hebbax pretrain k={k} probe: {curve}", flush=True)
        res["pretrain_probe"][str(k)] = curve
        if not args.probe_only:
            res["ft_from_k"][str(k)] = finetune_from(pre_vars, f"k{k}")

    if args.probe_only:
        # control: identical probe on FROZEN RANDOM features (alpha=0,
        # same w_nrm forward, head-only training) — SWTA features only
        # matter if their probe clears this
        spec0 = HebbSpec(mode=args.hebb_mode, k=50.0, w_nrm=True, alpha=0.0,
                         exclude=tuple(EXCLUDE))
        model0 = get_network("unet", 3, 2, hebb=spec0)
        rngs0 = {"params": jax.random.PRNGKey(seed),
                 "dropout": jax.random.PRNGKey(seed + 1)}
        v0 = model0.init(rngs0, jnp.asarray(tr_x[:1]), train=False)
        tx0 = optax.adam(lr)
        mask0 = pretrain_trainable_mask(v0["params"], spec0.exclude)
        step0 = make_sup_train_step(model0, "unet", criterion, tx0,
                                    trainable_mask=mask0,
                                    backprop_only=spec0.exclude)
        curve, _ = train_curve(model0, v0, tx0, step0, tr_x, tr_y,
                               args.pre_epochs)
        print(f"# hebbax random-frozen probe: {curve}", flush=True)
        res["random_frozen_probe"] = curve
        return res

    # from-random control (k-independent)
    rnd_model = get_network("unet", 3, 2)
    rngs_r = {"params": jax.random.PRNGKey(seed + 20),
              "dropout": jax.random.PRNGKey(seed + 21)}
    rnd_vars = rnd_model.init(rngs_r, jnp.asarray(tr_x[:1]), train=False)
    tx_r = optax.adam(args.ft_lr)
    step_r = make_sup_train_step(rnd_model, "unet", criterion, tx_r)
    curve, _ = train_curve(rnd_model, rnd_vars, tx_r, step_r,
                           tr_x, tr_y, args.ft_epochs, lab_idx=lab)
    print(f"# hebbax ft-from-random: {curve}", flush=True)
    res["ft_from_random"] = curve
    return res


# ---------------------------------------------------------------- torch
def torch_explore(arrays, args):
    import torch

    u = load_module("/root/reference/models/networks_2d/unet.py",
                    "ref_unet")
    sys.path.insert(0, "/root/reference")
    from hebb.makehebbian import makehebbian
    from loss.loss_function import segmentation_loss as ref_loss

    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    lab = labeled_subset(len(tr_x), args.label_frac)
    criterion = ref_loss("dice", False)
    seed, bs = args.seed, args.batch_size

    def to_nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    def eval_fwd(model):
        def fwd(x):
            with torch.no_grad():
                out = model(to_nchw(x))
            return np.transpose(out.numpy(), (0, 2, 3, 1))
        return fwd

    def finetune_curve(model, lr, tag):
        opt = torch.optim.Adam(model.parameters(), lr=lr)
        curve = []
        bs_ft = min(bs, len(lab))
        for epoch in range(args.ft_epochs):
            model.train()
            for b in batches(len(lab), bs_ft, epoch):
                idx = lab[b]
                opt.zero_grad()
                loss = criterion(model(to_nchw(tr_x[idx])),
                                 torch.from_numpy(
                                     tr_y[idx][:, None].astype(np.int64)))
                loss.backward()
                opt.step()
            model.eval()
            curve.append(round(eval_metric(
                eval_fwd(model), va_x, va_y)[2], 4))
        print(f"# torch ft-from-{tag}: {curve}", flush=True)
        return curve

    res = {"ft_from_k": {}, "pretrain_probe": {}}
    for k in args.ks:
        hebb = {"mode": args.hebb_mode, "k": k, "w_nrm": True,
                "alpha": 1.0}
        torch.manual_seed(seed)
        model = u.UNet_Transposed_Leaky(3, 2)
        makehebbian(model, exclude=EXCLUDE, hebb_params=dict(hebb))
        model.train()
        opt = torch.optim.Adam(model.parameters(), lr=args.lr)
        probe, curve = 0.0, []
        sd = {kk: v.clone() for kk, v in model.state_dict().items()}
        for epoch in range(args.pre_epochs):
            model.train()
            for b in batches(len(tr_x), bs, epoch):
                opt.zero_grad()
                loss = criterion(model(to_nchw(tr_x[b])),
                                 torch.from_numpy(
                                     tr_y[b][:, None].astype(np.int64)))
                loss.backward()
                for m in model.modules():
                    if hasattr(m, "local_update"):
                        m.local_update()
                opt.step()
            model.eval()
            d = eval_metric(eval_fwd(model), va_x, va_y)[2]
            curve.append(round(d, 4))
            if d > probe:
                probe = d
                sd = {kk: v.clone() for kk, v in model.state_dict().items()}
        print(f"# torch pretrain k={k} probe: {curve}", flush=True)
        res["pretrain_probe"][str(k)] = curve
        if args.probe_only:
            continue

        torch.manual_seed(seed + 1)
        ft = u.UNet_Transposed_Leaky(3, 2)
        hp0 = {"mode": args.hebb_mode, "k": k, "w_nrm": True, "alpha": 0}
        makehebbian(ft, exclude=EXCLUDE, hebb_params=hp0)
        ft.load_state_dict(sd)
        u.init_weights(ft.out_conv, init_type="kaiming")
        for p_ in ft.parameters():
            p_.requires_grad = True
        res["ft_from_k"][str(k)] = finetune_curve(ft, args.ft_lr, f"k{k}")

    if args.probe_only:
        # frozen-random control (alpha=0: local_update adds nothing;
        # only the excluded head backprops) — mirrors the hebbax control
        hebb0 = {"mode": args.hebb_mode, "k": 50, "w_nrm": True,
                 "alpha": 0}
        torch.manual_seed(seed)
        m0 = u.UNet_Transposed_Leaky(3, 2)
        makehebbian(m0, exclude=EXCLUDE, hebb_params=hebb0)
        opt = torch.optim.Adam(m0.parameters(), lr=args.lr)
        curve = []
        for epoch in range(args.pre_epochs):
            m0.train()
            for b in batches(len(tr_x), bs, epoch):
                opt.zero_grad()
                loss = criterion(m0(to_nchw(tr_x[b])),
                                 torch.from_numpy(
                                     tr_y[b][:, None].astype(np.int64)))
                loss.backward()
                for m in m0.modules():
                    if hasattr(m, "local_update"):
                        m.local_update()
                opt.step()
            m0.eval()
            curve.append(round(eval_metric(
                eval_fwd(m0), va_x, va_y)[2], 4))
        print(f"# torch random-frozen probe: {curve}", flush=True)
        res["random_frozen_probe"] = curve
        return res

    torch.manual_seed(seed + 2)
    rnd = u.UNet_Transposed_Leaky(3, 2)
    u.init_weights(rnd, init_type="kaiming")
    res["ft_from_random"] = finetune_curve(rnd, args.ft_lr, "random")
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--framework", choices=("hebbax", "torch"),
                   default="hebbax")
    p.add_argument("--ks", nargs="+", type=int, default=[5, 20, 50])
    p.add_argument("--pre_epochs", default=20, type=int)
    p.add_argument("--ft_epochs", default=20, type=int)
    p.add_argument("--size", default=64, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--ft_lr", default=1e-3, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--label_frac", default=0.05, type=float)
    p.add_argument("--n_train", default=64, type=int)
    p.add_argument("--n_val", default=24, type=int)
    p.add_argument("--data", default="texture")
    p.add_argument("--noise", default=0.5, type=float,
                   help="texture noise level (std in units of the "
                        "grating amplitude); 0.5 = r3 default")
    p.add_argument("--period", default=5.0, type=float)
    p.add_argument("--hebb_mode", default="swta_t",
               help="hebbian rule for pretraining (swta_t | hpca_t)")
    p.add_argument("--probe_only", action="store_true",
                   help="pretrain + probe curves only (fast diagnostic "
                        "of whether SWTA features encode the cue)")
    p.add_argument("--out", default="/tmp/explore_bootstrap.json")
    p.add_argument("--dataroot", default="/tmp/parity_hebb_r4")
    args = p.parse_args()

    droot = (f"{args.dataroot}_{args.data}_{args.size}_{args.n_train}"
             f"_{args.n_val}")
    genkw = {}
    if args.data == "texture" and (args.noise != 0.5 or args.period != 5.0):
        genkw = {"noise": args.noise, "period": args.period}
        droot += f"_n{args.noise}_p{args.period}"
    elif args.data == "palette" and args.noise != 0.5:
        genkw = {"noise": args.noise}
        droot += f"_n{args.noise}"
    arrays = make_data(droot, args.size, n_train=args.n_train,
                       n_val=args.n_val, kind=args.data, **genkw)
    fn = hebbax_explore if args.framework == "hebbax" else torch_explore
    res = {"config": vars(args), "result": fn(arrays, args)}
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["result"], indent=1))


if __name__ == "__main__":
    main()
