#!/usr/bin/env python
"""Cross-framework weight transplant for the Hebbian bootstrap cycle.

Pretrains in BOTH frameworks (identical data/batches), then maps the
pretrained state ACROSS frameworks (hebbax<->torch, exact param-name
mapping for UNet2D / UNet_Transposed_Leaky) and runs the 20%%-label
fine-tune in each framework from each weight set:

    torch-finetune(torch-weights)     torch-finetune(hebbax-weights)
    hebbax-finetune(hebbax-weights)   hebbax-finetune(torch-weights)

If the collapse follows the MACHINERY, hebbax's fine-tune is wrong; if
it follows the WEIGHTS, hebbax's pretrained state is qualitatively
different.  The mapping itself is validated by cross-framework eval
Dice equality on the transplanted pretrained nets."""

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

# ---------------------------------------------------------------- mapping

def _block(hx, tch):
    return [((*hx, "conv1"), f"{tch}.0"), ((*hx, "bn1"), f"{tch}.1"),
            ((*hx, "conv2"), f"{tch}.4"), ((*hx, "bn2"), f"{tch}.5")]


def _dec_block(hx, tch):
    return [((*hx, "conv1"), f"{tch}.0"), ((*hx, "bn1"), f"{tch}.1"),
            ((*hx, "conv2"), f"{tch}.3"), ((*hx, "bn2"), f"{tch}.4")]


def unet2d_mapping():
    """[(hebbax module path tuple, torch module prefix)] for UNet2D <->
    UNet_Transposed_Leaky (reference models/networks_2d/unet.py:423-478)."""
    m = _block(("encoder", "in_conv"), "encoder.in_conv.conv_conv")
    for i in range(1, 5):
        m += _block(("encoder", f"down{i}"),
                    f"encoder.down{i}.maxpool_conv.1.conv_conv")
    for i in range(1, 5):
        m.append((("main_decoder", f"up{i}", "conv1x1"),
                  f"main_decoder.up{i}.conv1x1"))
        m += _dec_block(("main_decoder", f"up{i}", "conv"),
                        f"main_decoder.up{i}.conv.conv")
    m += [(("out_conv", "conv1"), "out_conv.0"),
          (("out_conv", "conv2"), "out_conv.3"),
          (("out_conv", "conv_out"), "out_conv.6")]
    return m


def hebbax_to_torch_sd(pre_vars, template_sd):
    """Overwrite template torch state_dict entries from hebbax vars."""
    import torch

    from flax import traverse_util

    params = traverse_util.flatten_dict(pre_vars["params"])
    stats = traverse_util.flatten_dict(pre_vars.get("batch_stats", {}))
    sd = {k: v.clone() for k, v in template_sd.items()}

    def put(key, arr):
        t = torch.from_numpy(np.ascontiguousarray(arr))
        assert key in sd, key
        assert sd[key].shape == t.shape, (key, sd[key].shape, t.shape)
        sd[key] = t

    for hx, tch in unet2d_mapping():
        if hx[-1].startswith("bn"):
            put(f"{tch}.weight", params[(*hx, "scale")])
            put(f"{tch}.bias", params[(*hx, "bias")])
            put(f"{tch}.running_mean", stats[(*hx, "mean")])
            put(f"{tch}.running_var", stats[(*hx, "var")])
        else:
            k = params[(*hx, "kernel")]
            put(f"{tch}.weight", np.transpose(k, (3, 2, 0, 1)))
            if (*hx, "bias") in params:
                put(f"{tch}.bias", params[(*hx, "bias")])
    return sd


def torch_sd_to_hebbax(sd, fresh_vars):
    """Build hebbax variables from a torch state_dict."""
    from flax import traverse_util

    params = dict(traverse_util.flatten_dict(fresh_vars["params"]))
    stats = dict(traverse_util.flatten_dict(
        fresh_vars.get("batch_stats", {})))

    def arr(key):
        return sd[key].detach().numpy()

    for hx, tch in unet2d_mapping():
        if hx[-1].startswith("bn"):
            params[(*hx, "scale")] = arr(f"{tch}.weight")
            params[(*hx, "bias")] = arr(f"{tch}.bias")
            stats[(*hx, "mean")] = arr(f"{tch}.running_mean")
            stats[(*hx, "var")] = arr(f"{tch}.running_var")
        else:
            params[(*hx, "kernel")] = np.ascontiguousarray(
                np.transpose(arr(f"{tch}.weight"), (2, 3, 1, 0)))
            if (*hx, "bias") in params:
                b = f"{tch}.bias"
                params[(*hx, "bias")] = (
                    arr(b) if b in sd
                    else np.zeros_like(params[(*hx, "bias")]))
    out = {"params": traverse_util.unflatten_dict(params)}
    if stats:
        out["batch_stats"] = traverse_util.unflatten_dict(stats)
    return out


# ---------------------------------------------------------------- torch

def torch_pretrain(arrays, pre_epochs, bs, lr, seed):
    import torch

    u = load_module("/root/reference/models/networks_2d/unet.py",
                    "ref_unet")
    sys.path.insert(0, "/root/reference")
    from hebb.makehebbian import makehebbian
    from loss.loss_function import segmentation_loss as ref_loss

    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    criterion = ref_loss("dice", False)

    def to_nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

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
        d = torch_eval(model, va_x, va_y)
        if d > probe:
            probe = d
            sd = {k: v.clone() for k, v in model.state_dict().items()}
    return probe, sd


def torch_eval(model, va_x, va_y):
    import torch

    def fwd(x):
        with torch.no_grad():
            out = model(torch.from_numpy(
                np.transpose(x, (0, 3, 1, 2)).copy()))
        return np.transpose(out.numpy(), (0, 2, 3, 1))
    return eval_metric(fwd, va_x, va_y)[2]


def torch_finetune(arrays, sd, ft_epochs, bs, lr, seed, frac, tag):
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

    torch.manual_seed(seed + 1)
    ft = u.UNet_Transposed_Leaky(3, 2)
    hp0 = dict(HEBB)
    hp0["alpha"] = 0
    makehebbian(ft, exclude=EXCLUDE, hebb_params=hp0)
    ft.load_state_dict(sd)
    # transplant validation: eval Dice with the loaded weights
    ft.eval()
    d0 = torch_eval(ft, va_x, va_y)
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
        trace.append(round(torch_eval(ft, va_x, va_y), 4))
    print(f"# {tag}: load-eval {d0:.4f} best {max(trace):.4f} "
          f"trace {trace}", flush=True)
    return max(trace)


# ---------------------------------------------------------------- hebbax

def hebbax_pretrain(arrays, pre_epochs, bs, lr, seed):
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
    best, best_vars = 0.0, None
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
            best_vars = jax.tree_util.tree_map(np.asarray, variables_e)
    return best, best_vars


def hebbax_finetune(arrays, pre_vars, ft_epochs, bs, lr, seed, frac,
                    tag):
    import jax.numpy as jnp
    import optax

    from hebbax.cli.common import reinit_excluded
    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_eval_step, make_sup_train_step
    from hebbax.hebb.spec import HebbSpec
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss

    tr_x, tr_y = arrays["train"]
    va_x, va_y = arrays["val"]
    lab = labeled_subset(len(tr_x), frac)
    criterion = segmentation_loss("dice", False, num_classes=2)
    spec0 = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=0.0,
                     exclude=tuple(EXCLUDE))
    m = get_network("unet", 3, 2, hebb=spec0)
    rngs_ft = {"params": jax.random.PRNGKey(seed + 10),
               "dropout": jax.random.PRNGKey(seed + 11)}
    fresh = m.init(rngs_ft, jnp.asarray(tr_x[:1]), train=False)
    v = dict(fresh)
    v["params"] = pre_vars["params"]
    if "batch_stats" in pre_vars:
        v["batch_stats"] = pre_vars["batch_stats"]
    # transplant validation: eval with loaded weights (pre-head-reinit)
    eval_step = make_eval_step(m, "unet")

    def fwd0(x):
        return np.asarray(eval_step(
            {k: v[k] for k in v}, {"image": jnp.asarray(x)})["logits"])

    d0 = eval_metric(fwd0, va_x, va_y)[2]
    v["params"] = reinit_excluded(pre_vars["params"], fresh["params"],
                                  EXCLUDE)
    tx = optax.adam(lr)
    step = make_sup_train_step(m, "unet", criterion, tx)
    state = TrainState(params=v["params"],
                       batch_stats=v.get("batch_stats"),
                       opt_state=tx.init(v["params"]), step=0)
    trace = []
    bs_eff = min(bs, len(lab))
    for epoch in range(ft_epochs):
        for i, b in enumerate(batches(len(lab), bs_eff, epoch)):
            idx = lab[b]
            batch = {"image": jnp.asarray(tr_x[idx]),
                     "mask": jnp.asarray(tr_y[idx])}
            state, _ = step(state, batch,
                            jax.random.PRNGKey(epoch * 1000 + i))
        variables_e = state.variables

        def fwd(x):
            return np.asarray(eval_step(
                variables_e, {"image": jnp.asarray(x)})["logits"])

        trace.append(round(eval_metric(fwd, va_x, va_y)[2], 4))
    print(f"# {tag}: load-eval {d0:.4f} best {max(trace):.4f} "
          f"trace {trace}", flush=True)
    return max(trace)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    pre_epochs, ft_epochs, bs, lr, frac = 30, 12, 8, 1e-3, 0.05
    arrays = make_data("/tmp/parity_hebb_64_64_24", 64, n_train=64,
                       n_val=24)

    hx_probe, hx_vars = hebbax_pretrain(arrays, pre_epochs, bs, lr, seed)
    print(f"# hebbax probe {hx_probe:.4f}", flush=True)
    t_probe, t_sd = torch_pretrain(arrays, pre_epochs, bs, lr, seed)
    print(f"# torch probe {t_probe:.4f}", flush=True)

    # cross maps
    sd_from_hx = hebbax_to_torch_sd(hx_vars, t_sd)
    import jax.numpy as jnp  # noqa: F401

    from hebbax.hebb.spec import HebbSpec
    from hebbax.models import get_network
    spec0 = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=0.0,
                     exclude=tuple(EXCLUDE))
    m = get_network("unet", 3, 2, hebb=spec0)
    import jax as _jax
    fresh = m.init({"params": _jax.random.PRNGKey(99),
                    "dropout": _jax.random.PRNGKey(98)},
                   jnp.asarray(arrays["train"][0][:1]), train=False)
    hx_from_t = torch_sd_to_hebbax(t_sd, fresh)

    torch_finetune(arrays, t_sd, ft_epochs, bs, lr, seed, frac,
                   "torch-ft(torch-w)")
    torch_finetune(arrays, sd_from_hx, ft_epochs, bs, lr, seed, frac,
                   "torch-ft(hebbax-w)")
    hebbax_finetune(arrays, hx_vars, ft_epochs, bs, lr, seed, frac,
                    "hebbax-ft(hebbax-w)")
    hebbax_finetune(arrays, hx_from_t, ft_epochs, bs, lr, seed, frac,
                    "hebbax-ft(torch-w)")


if __name__ == "__main__":
    main()
