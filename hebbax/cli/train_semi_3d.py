"""Semi-supervised 3D trainers: EM, UAMT, CPS, URPC, CCT, DTC
(reference: train_semi_{EM,UAMT,CPS,URPC,CCT,DTC}_3d.py), sharing the
algorithm steps with the 2D family — only the data pipeline (patch
queues) and batch prep differ."""

import argparse

import jax

from ..config.datasets import dataset_cfg
from ..engine.semi import (CPSTrainer, DualState, SemiTrainer,
                           UAMTDualTrainer, cct_unsup, deep4_sup,
                           dtc_sup, dtc_unsup, em_unsup, make_cps_step,
                           make_semi_step, make_uamt_step, urpc_unsup)
from ..engine.state import TrainState
from ..engine.steps import make_eval_step
from ..models import network_meta
from ..ops.losses import segmentation_loss
from ..utils.rundir import dump_config
from . import common, common3d
from .train_sup_3d import run_dir_3d

# s2d: exact-parity TPU fast paths (tests/test_unet3d_s2d.py etc.);
# reference defaults are the unfolded unet3d family
ALGO_NETWORK_DEFAULT = {"em": "unet3d_s2d", "uamt": "unet3d_s2d",
                        "cps": "unet3d_s2d", "urpc": "unet3d_urpc_s2d",
                        "cct": "unet3d_cct_s2d", "dtc": "unet3d_dtc_s2d"}


def add_args(parser, algo):
    parser.add_argument("-u", "--unsup_weight", default=1.0, type=float)
    parser.add_argument("--load_weights", default=None, type=str)
    parser.add_argument("--load_hebbian_weights", default=None, type=str)
    parser.add_argument("--hebbian_rule", default="swta_t", type=str)
    parser.add_argument("--hebb_inv_temp", default=1, type=int)
    if algo == "uamt":
        parser.add_argument("--ema_decay", default=0.99, type=float)
    if algo == "dtc":
        parser.add_argument("--beta", default=0.3, type=float)
    parser.set_defaults(network=ALGO_NETWORK_DEFAULT[algo])
    return parser


def build(args, algo):
    cfg = dataset_cfg(args.dataset_name)
    n_cls = cfg["NUM_CLASSES"]
    paths = run_dir_3d(args, algo=algo)
    dump_config(paths, args)

    sup_queues = common3d.make_queues_3d(args, cfg, sup=True,
                                         sdf=(algo == "dtc"))
    loaders = {"train_sup": sup_queues["train"], "val": sup_queues["val"],
               "train_unsup": common3d.make_queues_3d(
                   args, cfg, sup=False, splits=("train",))["train"]}

    model, variables, hebb = common3d.build_model_3d(
        args, cfg, load_hebbian=args.load_hebbian_weights,
        load_weights=args.load_weights)
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

    if algo in ("em", "urpc", "cct", "dtc"):
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats"),
                           opt_state=tx.init(variables["params"]), step=0)
        if algo == "em":
            unsup_fn, sup_fn = em_unsup(n_cls), None
        elif algo == "urpc":
            unsup_fn, sup_fn = urpc_unsup, deep4_sup(criterion)
        elif algo == "cct":
            unsup_fn, sup_fn = cct_unsup, deep4_sup(criterion)
        else:
            unsup_fn = dtc_unsup
            sup_fn = dtc_sup(criterion, beta=args.beta, num_classes=n_cls)
        step = make_semi_step(model, args.network, criterion, tx,
                              unsup_fn, sup_fn)
        trainer = SemiTrainer(state=state, train_step=step, **common_kw)
    elif algo in ("uamt", "cps"):
        d = dict(vars(args))
        d["seed"] = args.seed + 7919
        args2 = argparse.Namespace(**d)
        model2, variables2, _ = common3d.build_model_3d(args2, cfg)
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
            tx2 = common.build_tx(
                args, steps_per_epoch=len(loaders["train_sup"]))
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

    trainer.prep = common3d.prep_batch_3d
    return trainer


def main(algo, argv=None):
    parser = add_args(common3d.base_parser_3d(), algo)
    args = parser.parse_args(argv)
    return build(args, algo).run()
