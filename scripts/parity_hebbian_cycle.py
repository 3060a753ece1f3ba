#!/usr/bin/env python
"""End-to-end Hebbian bootstrap cycle parity control (VERDICT r2 #5).

The repo's POINT is pretrain->finetune bootstrapping
(/root/reference/reproduce_hebbian_semi_supervised_2d.sh:53-80).  This
script runs the FULL cycle in BOTH frameworks on the identical synthetic
dataset, identical labeled subset, identical batch order:

  1. Hebbian unsupervised pretrain (swta_t, k=50, w_nrm, alpha=1,
     head excluded; dice backprop reaches only the head; hebbian kernels
     update with grad = -delta through the same adam step —
     /root/reference/pretrain_hebbian_unsup_2d.py:174-195).
  2. Fine-tune at 20% labels from the pretrained weights (alpha=0
     weight-norm forward, head re-initialized, all params trainable —
     /root/reference/train_sup_2d.py:150-168).
  3. Fine-tune at 20% labels from RANDOM init (plain net) — the control
     that isolates the Hebbian advantage per framework.

Reports, per framework: pretrain head probe Dice, best fine-tune val
Dice from pretrain and from random init, and the Hebbian-vs-random
delta.  Parity means both frameworks show a comparable delta.

Usage: python scripts/parity_hebbian_cycle.py [--pre_epochs 20]
           [--ft_epochs 20] [--size 64] [--out /tmp/parity_hebb]
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

HEBB = {"mode": "swta_t", "k": 50, "w_nrm": True, "alpha": 1.0}
EXCLUDE = ["out_conv"]


def labeled_subset(n, frac=0.2, seed=7):
    n_lab = max(2, int(round(frac * n)))
    return np.sort(np.random.RandomState(seed).permutation(n)[:n_lab])


# ---------------------------------------------------------------- torch
def torch_cycle(arrays, pre_epochs, ft_epochs, bs, lr, seed=0,
                frac=0.2, k=50):
    import torch

    u = load_module("/root/reference/models/networks_2d/unet.py",
                    "ref_unet")
    sys.path.insert(0, "/root/reference")
    from hebb.makehebbian import makehebbian
    from loss.loss_function import segmentation_loss as ref_loss

    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    lab = labeled_subset(len(tr_x), frac)
    criterion = ref_loss("dice", False)
    HEBB = {"mode": "swta_t", "k": k, "w_nrm": True, "alpha": 1.0}

    def to_nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    def eval_fwd(model):
        def fwd(x):
            with torch.no_grad():
                out = model(to_nchw(x))
            return np.transpose(out.numpy(), (0, 2, 3, 1))
        return fwd

    def finetune(model, tag):
        opt = torch.optim.Adam(model.parameters(), lr=lr)
        best = 0.0
        bs_ft = min(bs, len(lab))  # 20% subset can be < batch size
        for epoch in range(ft_epochs):
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
            best = max(best, eval_metric(eval_fwd(model), va_x, va_y)[2])
        print(f"# torch {tag}: best val Dice {best:.4f}", flush=True)
        return best

    # 1. pretrain (full train set, head-only backprop + local_update);
    #    best-probe-epoch snapshot, mirroring the reference's best_JI
    #    checkpoint protocol (utils save on improved val metric)
    torch.manual_seed(seed)
    model = u.UNet_Transposed_Leaky(3, 2)
    makehebbian(model, exclude=EXCLUDE, hebb_params=dict(HEBB))
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    probe, sd = 0.0, {k: v.clone()
                      for k, v in model.state_dict().items()}
    for epoch in range(pre_epochs):
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
        if d > probe:
            probe = d
            sd = {k: v.clone() for k, v in model.state_dict().items()}

    # 2. fine-tune from pretrain: alpha=0 forward, head re-kaiming'd,
    #    everything trainable (train_sup_2d.py:150-168)
    torch.manual_seed(seed + 1)
    ft = u.UNet_Transposed_Leaky(3, 2)
    hp0 = dict(HEBB)
    hp0["alpha"] = 0
    makehebbian(ft, exclude=EXCLUDE, hebb_params=hp0)
    ft.load_state_dict(sd)
    u.init_weights(ft.out_conv, init_type="kaiming")
    for p in ft.parameters():
        p.requires_grad = True
    best_pre = finetune(ft, "finetune-from-hebbian")

    # 3. fine-tune from random init (plain net).  get_network ALWAYS
    #    applies init_weights(model, 'kaiming') (unet.py:707); without
    #    it this cell sits at torch's default init and trains visibly
    #    slower (best Dice ~0.68 vs ~0.9), inflating the torch
    #    "hebbian advantage" relative to the kaiming-initialized
    #    hebbax random cell.
    torch.manual_seed(seed + 2)
    rnd = u.UNet_Transposed_Leaky(3, 2)
    u.init_weights(rnd, init_type="kaiming")
    best_rnd = finetune(rnd, "finetune-from-random")
    return {"pretrain_probe_dice": round(probe, 4),
            "finetune_from_hebbian": round(best_pre, 4),
            "finetune_from_random": round(best_rnd, 4),
            "hebbian_advantage": round(best_pre - best_rnd, 4)}


# --------------------------------------------------------------- hebbax
def hebbax_cycle(arrays, pre_epochs, ft_epochs, bs, lr, seed=0,
                 network="unet", frac=0.2, k=50):
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
    lab = labeled_subset(len(tr_x), frac)
    criterion = segmentation_loss("dice", False, num_classes=2)

    def train(model, variables, step_fn, xs, ys, epochs, lab_idx=None):
        step, tx = step_fn
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats"),
                           opt_state=tx.init(variables["params"]), step=0)
        eval_step = make_eval_step(model, "unet")
        best, best_state = 0.0, None
        n = len(xs) if lab_idx is None else len(lab_idx)
        bs_eff = min(bs, n)  # 20% subset can be < batch size
        for epoch in range(epochs):
            for i, b in enumerate(batches(n, bs_eff, epoch)):
                idx = b if lab_idx is None else lab_idx[b]
                batch = {"image": jnp.asarray(xs[idx]),
                         "mask": jnp.asarray(ys[idx])}
                # fold the RUN seed into the step key: with a
                # seed-independent key the sweep replays the identical
                # dropout-mask sequence in every run (torch redraws per
                # manual_seed), which measurably biased the 5%-label
                # cycle (see debug_hebb_matched.py / PARITY.md)
                state, _ = step(state, batch, jax.random.fold_in(
                    jax.random.PRNGKey(seed), epoch * 1000 + i))
            variables_e = state.variables

            def fwd(x):
                return np.asarray(eval_step(
                    variables_e, {"image": jnp.asarray(x)})["logits"])

            d = eval_metric(fwd, va_x, va_y)[2]
            if d > best:
                # host copies: the jitted step DONATES its state, so a
                # kept reference to a live epoch's buffers would be
                # deleted by the next step
                best, best_state = d, jax.tree_util.tree_map(
                    np.asarray, variables_e)
        return best, best_state

    # 1. pretrain
    spec = HebbSpec(mode="swta_t", k=float(k), w_nrm=True, alpha=1.0,
                    exclude=tuple(EXCLUDE))
    model = get_network(network, 3, 2, hebb=spec)
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1)}
    variables = model.init(rngs, jnp.asarray(tr_x[:1]), train=False)
    tx = optax.adam(lr)
    mask = pretrain_trainable_mask(variables["params"], spec.exclude)
    step = make_sup_train_step(model, "unet", criterion, tx,
                               hebb_alpha=1.0, trainable_mask=mask,
                               backprop_only=spec.exclude)
    probe, pre_vars = train(model, variables, (step, tx), tr_x, tr_y,
                            pre_epochs)

    # 2. fine-tune from pretrain (alpha=0 weight-norm forward, fresh head)
    spec0 = HebbSpec(mode="swta_t", k=float(k), w_nrm=True, alpha=0.0,
                     exclude=tuple(EXCLUDE))
    ft_model = get_network(network, 3, 2, hebb=spec0)
    rngs_ft = {"params": jax.random.PRNGKey(seed + 10),
               "dropout": jax.random.PRNGKey(seed + 11)}
    fresh = ft_model.init(rngs_ft, jnp.asarray(tr_x[:1]), train=False)
    ft_vars = dict(fresh)
    ft_vars["params"] = reinit_excluded(pre_vars["params"],
                                        fresh["params"], spec0.exclude)
    if "batch_stats" in pre_vars:
        ft_vars["batch_stats"] = pre_vars["batch_stats"]
    tx_ft = optax.adam(lr)
    step_ft = make_sup_train_step(ft_model, "unet", criterion, tx_ft)
    best_pre, _ = train(ft_model, ft_vars, (step_ft, tx_ft), tr_x, tr_y,
                        ft_epochs, lab_idx=lab)
    print(f"# hebbax finetune-from-hebbian: best val Dice "
          f"{best_pre:.4f}", flush=True)

    # 3. fine-tune from random init (plain net)
    rnd_model = get_network(network, 3, 2)
    rngs_r = {"params": jax.random.PRNGKey(seed + 20),
              "dropout": jax.random.PRNGKey(seed + 21)}
    rnd_vars = rnd_model.init(rngs_r, jnp.asarray(tr_x[:1]), train=False)
    tx_r = optax.adam(lr)
    step_r = make_sup_train_step(rnd_model, "unet", criterion, tx_r)
    best_rnd, _ = train(rnd_model, rnd_vars, (step_r, tx_r), tr_x, tr_y,
                        ft_epochs, lab_idx=lab)
    print(f"# hebbax finetune-from-random: best val Dice "
          f"{best_rnd:.4f}", flush=True)
    return {"pretrain_probe_dice": round(probe, 4),
            "finetune_from_hebbian": round(best_pre, 4),
            "finetune_from_random": round(best_rnd, 4),
            "hebbian_advantage": round(best_pre - best_rnd, 4)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pre_epochs", default=20, type=int)
    p.add_argument("--ft_epochs", default=20, type=int)
    p.add_argument("--size", default=64, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--out", default="/tmp/parity_hebb")
    p.add_argument("--skip_torch", action="store_true")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--label_frac", default=0.2, type=float)
    p.add_argument("--n_train", default=64, type=int)
    p.add_argument("--n_val", default=24, type=int)
    p.add_argument("--data", default="blob", choices=("blob", "texture"),
                   help="'texture' = orientation-only cue, no intensity "
                        "cue: the regime with bootstrap headroom")
    p.add_argument("--noise", default=0.5, type=float,
                   help="texture noise level; r4 exploration found 0.5 "
                        "leaves every cell at the trivial-Dice floor")
    p.add_argument("--period", default=5.0, type=float)
    p.add_argument("--hebb_k", default=50, type=int)
    p.add_argument("--skip_hebbax", action="store_true")
    args = p.parse_args()

    # key the dataset dir by its config: make_data reuses an existing
    # dir, so changing n_train/size must not silently serve stale data
    out = f"{args.out}_{args.data}_{args.size}_{args.n_train}_{args.n_val}"
    genkw = {}
    if args.data == "texture" and (args.noise != 0.5 or args.period != 5.0):
        genkw = {"noise": args.noise, "period": args.period}
        out += f"_n{args.noise}_p{args.period}"
    arrays = make_data(out, args.size, n_train=args.n_train,
                       n_val=args.n_val, kind=args.data, **genkw)
    res = {"config": vars(args)}
    if not args.skip_hebbax:
        res["hebbax"] = hebbax_cycle(
            arrays, args.pre_epochs, args.ft_epochs, args.batch_size,
            args.lr, seed=args.seed, frac=args.label_frac,
            k=args.hebb_k)
    if not args.skip_torch:
        res["torch_reference"] = torch_cycle(
            arrays, args.pre_epochs, args.ft_epochs, args.batch_size,
            args.lr, seed=args.seed, frac=args.label_frac,
            k=args.hebb_k)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
