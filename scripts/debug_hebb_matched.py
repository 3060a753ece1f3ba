#!/usr/bin/env python
"""Matched-dynamics fine-tune comparison: BOTH frameworks start from
the EXACT same state (hebbax Hebbian-pretrained trunk + the torch
re-kaiming'd head, transplanted), dropout disabled on both sides,
identical batch order — then fine-tune step-for-step and compare
per-epoch losses and val Dice.  Any divergence is a real machinery
parity bug (isolated from init/dropout/seed noise); agreement means the
cycle-sweep discrepancy is protocol noise at this toy scale."""

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
from debug_hebb_transplant import (hebbax_pretrain, hebbax_to_torch_sd,
                                   torch_sd_to_hebbax, torch_eval)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    pre_epochs, ft_epochs, bs, lr, frac = 30, 12, 8, 1e-3, 0.05
    arrays = make_data("/tmp/parity_hebb_64_64_24", 64, n_train=64,
                       n_val=24)
    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    lab = labeled_subset(len(tr_x), frac)
    bs_ft = min(bs, len(lab))

    hx_probe, hx_vars = hebbax_pretrain(arrays, pre_epochs, bs, lr, seed)
    print(f"# hebbax probe {hx_probe:.4f}", flush=True)

    # ---- torch ft model from transplanted hebbax weights ------------
    import torch

    u = load_module("/root/reference/models/networks_2d/unet.py",
                    "ref_unet")
    sys.path.insert(0, "/root/reference")
    from hebb.makehebbian import makehebbian
    from loss.loss_function import segmentation_loss as ref_loss

    torch.manual_seed(seed + 1)
    ft = u.UNet_Transposed_Leaky(3, 2)
    hp0 = dict(HEBB)
    hp0["alpha"] = 0
    makehebbian(ft, exclude=EXCLUDE, hebb_params=hp0)
    template_sd = {k: v.clone() for k, v in ft.state_dict().items()}
    ft.load_state_dict(hebbax_to_torch_sd(hx_vars, template_sd))
    u.init_weights(ft.out_conv, init_type="kaiming")
    for p in ft.parameters():
        p.requires_grad = True
    # disable dropout everywhere
    ndrop = 0
    for m in ft.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
            ndrop += 1
    print(f"# torch: zeroed {ndrop} dropout modules", flush=True)

    # the COMMON starting state (trunk + fresh torch head)
    start_sd = {k: v.clone() for k, v in ft.state_dict().items()}

    # ---- hebbax ft model from the SAME starting state ---------------
    import jax.numpy as jnp
    import optax
    from flax import linen as fnn

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_eval_step, make_sup_train_step
    from hebbax.hebb.spec import HebbSpec
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss

    # disable flax dropout (both the stock module and FastDropout)
    from hebbax.ops.dropout import FastDropout
    orig_drop = fnn.Dropout.__call__
    orig_fast = FastDropout.__call__
    fnn.Dropout.__call__ = lambda self, x, **kw: x
    FastDropout.__call__ = lambda self, x, **kw: x

    spec0 = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=0.0,
                     exclude=tuple(EXCLUDE))
    m = get_network("unet", 3, 2, hebb=spec0)
    fresh = m.init({"params": jax.random.PRNGKey(99),
                    "dropout": jax.random.PRNGKey(98)},
                   jnp.asarray(tr_x[:1]), train=False)
    v = torch_sd_to_hebbax(start_sd, fresh)

    criterion_hx = segmentation_loss("dice", False, num_classes=2)
    criterion_t = ref_loss("dice", False)
    tx = optax.adam(lr)
    step = make_sup_train_step(m, "unet", criterion_hx, tx)
    state = TrainState(params=v["params"],
                       batch_stats=v.get("batch_stats"),
                       opt_state=tx.init(v["params"]), step=0)
    eval_step = make_eval_step(m, "unet")

    opt = torch.optim.Adam(ft.parameters(), lr=lr)

    def to_nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    tr_hx, tr_t = [], []
    for epoch in range(ft_epochs):
        ft.train()
        for i, b in enumerate(batches(len(lab), bs_ft, epoch)):
            idx = lab[b]
            # torch step
            opt.zero_grad()
            loss_t = criterion_t(ft(to_nchw(tr_x[idx])),
                                 torch.from_numpy(
                                     tr_y[idx][:, None].astype(np.int64)))
            loss_t.backward()
            opt.step()
            # hebbax step
            batch = {"image": jnp.asarray(tr_x[idx]),
                     "mask": jnp.asarray(tr_y[idx])}
            state, out = step(state, batch,
                              jax.random.PRNGKey(epoch * 1000 + i))
            print(f"#   e{epoch} s{i}: loss torch {float(loss_t):.6f} "
                  f"hebbax {float(out['loss']):.6f}", flush=True)
        ft.eval()
        d_t = torch_eval(ft, va_x, va_y)
        variables_e = state.variables

        def fwd(x):
            return np.asarray(eval_step(
                variables_e, {"image": jnp.asarray(x)})["logits"])

        d_hx = eval_metric(fwd, va_x, va_y)[2]
        tr_t.append(round(d_t, 4))
        tr_hx.append(round(d_hx, 4))
        print(f"# epoch {epoch}: val Dice torch {d_t:.4f} "
              f"hebbax {d_hx:.4f}", flush=True)
    print(f"# torch  trace {tr_t}")
    print(f"# hebbax trace {tr_hx}")
    fnn.Dropout.__call__ = orig_drop
    FastDropout.__call__ = orig_fast


if __name__ == "__main__":
    main()
