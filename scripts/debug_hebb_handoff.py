#!/usr/bin/env python
"""Diagnose the hebbax finetune-from-hebbian degradation seen in
scripts/parity_hebbian_cycle.py (hebbian_advantage < 0 while torch's
is > 0).  Runs the identical pretrain, then four finetune variants:

  A. full finetune, head re-init          (the cycle's protocol)
  B. full finetune, head KEPT             (isolate head-reinit impact)
  C. head-only finetune, head re-init     (is the trunk still good?)
  D. full finetune, NO w_nrm re-spec      (is the alpha-0 w_nrm forward
                                           the destabilizer?)

with per-epoch val Dice traces.  CPU."""

import json
import os
import sys

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax.numpy as jnp
import optax

from parity_control import batches, eval_metric, make_data
from parity_hebbian_cycle import EXCLUDE, labeled_subset
from hebbax.cli.common import reinit_excluded
from hebbax.engine.state import TrainState
from hebbax.engine.steps import make_eval_step, make_sup_train_step
from hebbax.hebb.spec import HebbSpec
from hebbax.hebb.surgery import pretrain_trainable_mask
from hebbax.models import get_network
from hebbax.ops.losses import segmentation_loss


def train(model, variables, step, tx, xs, ys, epochs, bs, va, tag,
          lab_idx=None):
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    eval_step = make_eval_step(model, "unet")
    trace, best, best_state = [], 0.0, None
    n = len(xs) if lab_idx is None else len(lab_idx)
    bs_eff = min(bs, n)
    va_x, va_y = va
    for epoch in range(epochs):
        for i, b in enumerate(batches(n, bs_eff, epoch)):
            idx = b if lab_idx is None else lab_idx[b]
            batch = {"image": jnp.asarray(xs[idx]),
                     "mask": jnp.asarray(ys[idx])}
            state, _ = step(state, batch,
                            jax.random.PRNGKey(epoch * 1000 + i))
        variables_e = state.variables

        def fwd(x):
            return np.asarray(eval_step(
                variables_e, {"image": jnp.asarray(x)})["logits"])

        d = eval_metric(fwd, va_x, va_y)[2]
        trace.append(round(float(d), 4))
        if d > best:
            best, best_state = d, jax.tree_util.tree_map(
                np.asarray, variables_e)
    print(f"# {tag}: best {best:.4f} trace {trace}", flush=True)
    return best, best_state, trace


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    pre_epochs, ft_epochs, bs, lr = 30, 12, 8, 1e-3
    frac = 0.05
    out = "/tmp/parity_hebb_64_64_24"
    arrays = make_data(out, 64, n_train=64, n_val=24)
    tr_x, tr_y = arrays["train"]
    va = arrays["val"]
    lab = labeled_subset(len(tr_x), frac)
    criterion = segmentation_loss("dice", False, num_classes=2)

    # pretrain (identical to parity_hebbian_cycle.hebbax_cycle)
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
    probe, pre_vars, _ = train(model, variables, step, tx, tr_x, tr_y,
                               pre_epochs, bs, va, "pretrain-probe")

    res = {"probe": probe}

    def ft(tag, spec_ft, reinit_head, trunk_frozen):
        m = (get_network("unet", 3, 2, hebb=spec_ft) if spec_ft
             else get_network("unet", 3, 2))
        rngs_ft = {"params": jax.random.PRNGKey(seed + 10),
                   "dropout": jax.random.PRNGKey(seed + 11)}
        fresh = m.init(rngs_ft, jnp.asarray(tr_x[:1]), train=False)
        v = dict(fresh)
        if reinit_head:
            v["params"] = reinit_excluded(pre_vars["params"],
                                          fresh["params"], EXCLUDE)
        else:
            v["params"] = pre_vars["params"]
        if "batch_stats" in pre_vars:
            v["batch_stats"] = pre_vars["batch_stats"]
        txf = optax.adam(lr)
        kw = {}
        if trunk_frozen:
            kw = dict(trainable_mask=pretrain_trainable_mask(
                v["params"], tuple(EXCLUDE)),
                backprop_only=tuple(EXCLUDE))
        stepf = make_sup_train_step(m, "unet", criterion, txf, **kw)
        best, _, trace = train(m, v, stepf, txf, tr_x, tr_y, ft_epochs,
                               bs, va, tag, lab_idx=lab)
        res[tag] = {"best": round(best, 4), "trace": trace}

    spec0 = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=0.0,
                     exclude=tuple(EXCLUDE))
    ft("A_full_reinit_wnrm", spec0, True, False)
    ft("B_full_keephead_wnrm", spec0, False, False)
    ft("C_headonly_reinit_wnrm", spec0, True, True)
    ft("D_full_reinit_nownrm", None, True, False)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
