"""Semi-supervised 2D trainers: EM, UAMT, CPS, URPC, CCT.

One shared builder parameterized by algorithm, mirroring the reference's
five scripts (train_semi_{EM,UAMT,CPS,URPC,CCT}_2d.py) including their
run-dir tag schemes ('em_<net>' / 'h_em_<net>_<rule>' etc.,
train_semi_EM_2d.py:80-89) and the Hebbian-pretrained hand-off
(CPS/UAMT model2 gets model1's weights added, train_semi_CPS_2d.py:186-192).
"""

import os

import jax

from ..config.datasets import dataset_cfg
from ..engine.semi import (CPSTrainer, DualState, SemiTrainer,
                           UAMTDualTrainer, cct_unsup, deep4_sup, em_unsup,
                           make_cps_step, make_semi_step, make_uamt_step,
                           urpc_unsup)
from ..engine.state import TrainState
from ..engine.steps import make_eval_step
from ..models import network_meta
from ..ops.losses import segmentation_loss
from ..utils.rundir import RunPaths, dump_config
from . import common

# s2d: exact-parity TPU fast paths (tests/test_s2d.py); reference
# defaults are the unfolded unet/unet_urpc/unet_cct
ALGO_NETWORK_DEFAULT = {"em": "unet_s2d", "uamt": "unet_s2d",
                        "cps": "unet_s2d", "urpc": "unet_urpc_s2d",
                        "cct": "unet_cct_s2d"}


def add_args(parser, algo):
    parser.add_argument("-u", "--unsup_weight", default=1.0, type=float)
    parser.add_argument("--load_weights", default=None, type=str)
    parser.add_argument("--load_hebbian_weights", default=None, type=str)
    parser.add_argument("--hebbian_rule", default="swta_t", type=str)
    parser.add_argument("--hebb_inv_temp", default=1, type=int)
    if algo == "uamt":
        parser.add_argument("--ema_decay", default=0.99, type=float)
    parser.set_defaults(network=ALGO_NETWORK_DEFAULT[algo])
    return parser


def semi_run_dir(args, algo):
    """Tag scheme parity (train_semi_EM_2d.py:80-89)."""
    ds = os.path.split(args.path_dataset)[1]
    if args.regime < 100:
        if args.load_hebbian_weights:
            tag = f"h_{algo}_{args.network}_{args.hebbian_rule}"
            inv = args.hebb_inv_temp
        elif args.load_weights:
            tag = f"{algo}_{args.network}"
            inv = 1
        else:
            tag = f"{args.init_weights}_{algo}_{args.network}"
            inv = 1
        phase = "semi_sup"
    else:
        phase, tag, inv = "fully_sup", f"{algo}_{args.network}", 1
    run = os.path.join(args.path_root_exp, ds, phase, tag,
                       f"inv_temp-{inv}", f"regime-{args.regime}",
                       f"run-{args.seed}")
    paths = RunPaths(
        run=run,
        checkpoints=os.path.join(run, "checkpoints"),
        tensorboard=os.path.join(run, "runs"),
        val_seg_preds=os.path.join(run, "val_seg_preds"),
        train_seg_preds=(os.path.join(run, "train_seg_preds")
                         if args.debug else None))
    import dataclasses
    for p in dataclasses.asdict(paths).values():
        if p is not None:
            os.makedirs(p, exist_ok=True)
    return paths


def build(args, algo):
    cfg = dataset_cfg(args.dataset_name)
    n_cls = cfg["NUM_CLASSES"]
    paths = semi_run_dir(args, algo)
    dump_config(paths, args)

    loaders = {}
    sup_loaders = common.make_loaders_2d(args, cfg, sup=True)
    loaders["train_sup"] = sup_loaders["train"]
    loaders["val"] = sup_loaders["val"]
    loaders["train_unsup"] = common.make_loaders_2d(
        args, cfg, sup=False, splits=("train",))["train"]

    model, variables, hebb = common.build_model_2d(
        args, cfg, load_hebbian=args.load_hebbian_weights,
        load_weights=args.load_weights,
        sample_shape=(args.batch_size, 128, 128))
    tx = common.build_tx(args, steps_per_epoch=len(loaders["train_sup"]))
    criterion = segmentation_loss(args.loss, False, num_classes=n_cls)
    meta = network_meta(args.network)
    eval_step = make_eval_step(model, args.network, criterion,
                               needs_rng=bool(meta["rngs"]))
    hebb_meta = {}
    if hebb is not None:
        hebb_meta = {"hebb_params": hebb.to_dict(),
                     "layers_excluded": list(hebb.exclude)}
    common_kw = dict(model=model, eval_step=eval_step, loaders=loaders,
                     num_classes=n_cls, paths=paths, args=args,
                     hebb_meta=hebb_meta, palette=cfg["PALETTE"],
                     unsup_weight=args.unsup_weight)

    if algo in ("em", "urpc", "cct"):
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats"),
                           opt_state=tx.init(variables["params"]), step=0)
        if algo == "em":
            unsup_fn, sup_fn = em_unsup(n_cls), None
        elif algo == "urpc":
            unsup_fn, sup_fn = urpc_unsup, deep4_sup(criterion)
        else:
            unsup_fn, sup_fn = cct_unsup, deep4_sup(criterion)
        step = make_semi_step(model, args.network, criterion, tx,
                              unsup_fn, sup_fn)
        trainer = SemiTrainer(state=state, train_step=step, **common_kw)

    elif algo in ("uamt", "cps"):
        # second model: independent init (different rng), or
        # model1-perturbed when Hebbian-loaded (CPS_2d.py:186-192)
        args2 = _clone_args(args, seed=args.seed + 7919)
        model2, variables2, _ = common.build_model_2d(
            args2, cfg, load_hebbian=None, load_weights=None,
            sample_shape=(args.batch_size, 128, 128))
        if args.load_hebbian_weights:
            variables2 = dict(variables2)
            variables2["params"] = jax.tree_util.tree_map(
                lambda a, b: a + b, variables2["params"],
                variables["params"])
        if algo == "uamt":
            state = DualState(
                params1=variables["params"],
                batch_stats1=variables.get("batch_stats"),
                opt_state1=tx.init(variables["params"]),
                params2=variables2["params"],
                batch_stats2=variables2.get("batch_stats"),
                opt_state2=None, step=0)
            step = make_uamt_step(model, args.network, criterion, tx,
                                  n_cls, args.num_epochs,
                                  ema_decay=args.ema_decay)
            trainer = UAMTDualTrainer(state=state, train_step=step,
                                      **common_kw)
        else:
            tx2 = common.build_tx(args,
                                  steps_per_epoch=len(loaders["train_sup"]))
            state = DualState(
                params1=variables["params"],
                batch_stats1=variables.get("batch_stats"),
                opt_state1=tx.init(variables["params"]),
                params2=variables2["params"],
                batch_stats2=variables2.get("batch_stats"),
                opt_state2=tx2.init(variables2["params"]), step=0)
            step = make_cps_step(model, model2, args.network, criterion,
                                 tx, tx2)
            trainer = CPSTrainer(state=state, train_step=step, **common_kw)
    else:
        raise ValueError(algo)

    trainer.prep = common.prep_batch
    common.enable_device_augment(trainer, args)
    return trainer


def _clone_args(args, **over):
    import argparse
    d = dict(vars(args))
    d.update(over)
    return argparse.Namespace(**d)


def main(algo, argv=None):
    parser = add_args(common.base_parser_2d(), algo)
    args = parser.parse_args(argv)
    trainer = build(args, algo)
    return trainer.run()
