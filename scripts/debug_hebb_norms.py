#!/usr/bin/env python
"""Compare pretrained per-layer kernel norms between the hebbax and
torch Hebbian pretrain cycles (same data/batches, each framework's own
init), and capture torch's per-epoch finetune trace.  Under the w_nrm
forward the loss is norm-invariant, but Adam's fixed-size steps perturb
a small-norm kernel's DIRECTION far more — candidate mechanism for the
hebbax finetune-from-hebbian collapse."""

import os
import sys

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from parity_control import batches, eval_metric, load_module, make_data
from parity_hebbian_cycle import EXCLUDE, HEBB, labeled_subset


def torch_side(arrays, pre_epochs, ft_epochs, bs, lr, seed, frac):
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

    def to_nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    def eval_fwd(model):
        def fwd(x):
            with torch.no_grad():
                out = model(to_nchw(x))
            return np.transpose(out.numpy(), (0, 2, 3, 1))
        return fwd

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

    print(f"# torch probe {probe:.4f}")
    print("# torch per-layer kernel norms (hebbian convs):")
    for k, v in sd.items():
        if k.endswith("weight") and v.ndim == 4:
            w = v.reshape(v.shape[0], -1) if "up" not in k else v
            per = v.reshape(v.shape[0], -1).norm(dim=1)
            print(f"  {k:55s} {tuple(v.shape)} "
                  f"mean|w_o| {per.mean():.4f} min {per.min():.4f} "
                  f"max {per.max():.4f}")

    # finetune-from-hebbian with per-epoch trace
    torch.manual_seed(seed + 1)
    ft = u.UNet_Transposed_Leaky(3, 2)
    hp0 = dict(HEBB)
    hp0["alpha"] = 0
    makehebbian(ft, exclude=EXCLUDE, hebb_params=hp0)
    ft.load_state_dict(sd)
    u.init_weights(ft.out_conv, init_type="kaiming")
    for p in ft.parameters():
        p.requires_grad = True
    opt = torch.optim.Adam(ft.parameters(), lr=lr)
    bs_ft = min(bs, len(lab))
    trace = []
    for epoch in range(ft_epochs):
        ft.train()
        for b in batches(len(lab), bs_ft, epoch):
            idx = lab[b]
            opt.zero_grad()
            loss = criterion(ft(to_nchw(tr_x[idx])),
                             torch.from_numpy(
                                 tr_y[idx][:, None].astype(np.int64)))
            loss.backward()
            opt.step()
        ft.eval()
        trace.append(round(eval_metric(eval_fwd(ft), va_x, va_y)[2], 4))
    print(f"# torch finetune-from-hebbian trace {trace}")


def hebbax_side(arrays, pre_epochs, bs, lr, seed):
    import jax.numpy as jnp
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_eval_step, make_sup_train_step
    from hebbax.hebb.spec import HebbSpec
    from hebbax.hebb.surgery import pretrain_trainable_mask
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss

    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    criterion = segmentation_loss("dice", False, num_classes=2)

    spec = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
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
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    eval_step = make_eval_step(model, "unet")
    best, best_params = 0.0, None
    for epoch in range(pre_epochs):
        for i, b in enumerate(batches(len(tr_x), bs, epoch)):
            batch = {"image": jnp.asarray(tr_x[b]),
                     "mask": jnp.asarray(tr_y[b])}
            state, _ = step(state, batch,
                            jax.random.PRNGKey(epoch * 1000 + i))
        variables_e = state.variables

        def fwd(x):
            return np.asarray(eval_step(
                variables_e, {"image": jnp.asarray(x)})["logits"])

        d = eval_metric(fwd, va_x, va_y)[2]
        if d > best:
            best = d
            best_params = jax.tree_util.tree_map(np.asarray,
                                                 variables_e["params"])

    print(f"# hebbax probe {best:.4f}")
    print("# hebbax per-layer kernel norms:")
    for path, v in jax.tree_util.tree_leaves_with_path(best_params):
        name = jax.tree_util.keystr(path)
        if v.ndim == 4:
            per = np.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0)
            print(f"  {name:55s} {v.shape} "
                  f"mean|w_o| {per.mean():.4f} min {per.min():.4f} "
                  f"max {per.max():.4f}")


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    pre_epochs, ft_epochs, bs, lr, frac = 30, 12, 8, 1e-3, 0.05
    arrays = make_data("/tmp/parity_hebb_64_64_24", 64, n_train=64,
                       n_val=24)
    hebbax_side(arrays, pre_epochs, bs, lr, seed)
    torch_side(arrays, pre_epochs, ft_epochs, bs, lr, seed, frac)


if __name__ == "__main__":
    main()
