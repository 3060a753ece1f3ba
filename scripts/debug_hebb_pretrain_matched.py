#!/usr/bin/env python
"""Matched-dynamics PRETRAIN comparison (probe-Dice gap diagnosis).

The cycle sweep shows a large pretrain-probe gap (e.g. seed 0: hebbax
0.26 vs torch 0.94 best val Dice) while fine-tune cells agree.  This
script isolates the pretrain dynamics: BOTH frameworks start from the
EXACT same init (hebbax init transplanted to torch), dropout disabled
on both sides, identical batch order — then run the Hebbian pretrain
(swta_t, k=50, head-only backprop + local update, adam) step-for-step
and compare per-epoch train loss, probe val Dice, and per-layer kernel
norms.  Divergence here is a machinery bug; agreement means the sweep
gap is init/dropout-stream sensitivity of the probe at toy scale.
"""

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
from parity_hebbian_cycle import EXCLUDE, HEBB
from debug_hebb_transplant import hebbax_to_torch_sd, torch_eval


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    pre_epochs, bs, lr = (int(os.environ.get("PRE_EPOCHS", "20")), 8,
                          1e-3)
    arrays = make_data("/tmp/parity_hebb_64_64_24", 64, n_train=64,
                       n_val=24)
    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]

    # ---------------- hebbax model + init --------------------------
    import jax.numpy as jnp
    import optax
    from flax import linen as fnn

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_eval_step, make_sup_train_step
    from hebbax.hebb.spec import HebbSpec
    from hebbax.hebb.surgery import pretrain_trainable_mask
    from hebbax.models import get_network
    from hebbax.ops.dropout import FastDropout
    from hebbax.ops.losses import segmentation_loss

    orig_drop = fnn.Dropout.__call__
    orig_fast = FastDropout.__call__
    fnn.Dropout.__call__ = lambda self, x, **kw: x
    FastDropout.__call__ = lambda self, x, **kw: x

    criterion = segmentation_loss("dice", False, num_classes=2)
    spec = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                    exclude=tuple(EXCLUDE))
    model = get_network("unet", 3, 2, hebb=spec)
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1)}
    variables = model.init(rngs, jnp.asarray(tr_x[:1]), train=False)
    init_vars = jax.tree_util.tree_map(np.asarray, variables)

    # ---------------- torch model from the SAME init ----------------
    import torch

    u = load_module("/root/reference/models/networks_2d/unet.py",
                    "ref_unet")
    sys.path.insert(0, "/root/reference")
    from hebb.makehebbian import makehebbian
    from loss.loss_function import segmentation_loss as ref_loss

    torch.manual_seed(seed + 5)
    tmodel = u.UNet_Transposed_Leaky(3, 2)
    makehebbian(tmodel, exclude=EXCLUDE, hebb_params=dict(HEBB))
    template_sd = {k: v.clone() for k, v in tmodel.state_dict().items()}
    tmodel.load_state_dict(hebbax_to_torch_sd(init_vars, template_sd))
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    tcrit = ref_loss("dice", False)
    topt = torch.optim.Adam(tmodel.parameters(), lr=lr)

    def to_nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    # ---------------- hebbax step ------------------------------------
    tx = optax.adam(lr)
    mask = pretrain_trainable_mask(variables["params"], spec.exclude)
    step = make_sup_train_step(model, "unet", criterion, tx,
                               hebb_alpha=1.0, trainable_mask=mask,
                               backprop_only=spec.exclude)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    eval_step = make_eval_step(model, "unet")

    for epoch in range(pre_epochs):
        tmodel.train()
        h_loss = t_loss = 0.0
        for i, b in enumerate(batches(len(tr_x), bs, epoch)):
            batch = {"image": jnp.asarray(tr_x[b]),
                     "mask": jnp.asarray(tr_y[b])}
            state, aux = step(state, batch,
                              jax.random.PRNGKey(epoch * 1000 + i))
            h_loss += float(aux["loss"])

            topt.zero_grad()
            tl = tcrit(tmodel(to_nchw(tr_x[b])),
                       torch.from_numpy(tr_y[b][:, None]
                                        .astype(np.int64)))
            tl.backward()
            for m in tmodel.modules():
                if hasattr(m, "local_update"):
                    m.local_update()
            topt.step()
            t_loss += float(tl)

        variables_e = state.variables

        def fwd(x):
            return np.asarray(eval_step(
                variables_e, {"image": jnp.asarray(x)})["logits"])

        h_dice = eval_metric(fwd, va_x, va_y)[2]
        tmodel.eval()
        t_dice = torch_eval(tmodel, va_x, va_y)
        hk = np.linalg.norm(np.asarray(
            variables_e["params"]["encoder"]["in_conv"]["conv1"]
            ["kernel"]))
        tk = float(tmodel.encoder.in_conv.conv_conv[0].weight.norm())
        print(f"epoch {epoch:2d}  loss hx {h_loss:7.4f} tch {t_loss:7.4f}"
              f"  probeDice hx {h_dice:.4f} tch {t_dice:.4f}"
              f"  |in_conv.conv1| hx {hk:.4f} tch {tk:.4f}", flush=True)

    fnn.Dropout.__call__ = orig_drop
    FastDropout.__call__ = orig_fast


if __name__ == "__main__":
    main()
