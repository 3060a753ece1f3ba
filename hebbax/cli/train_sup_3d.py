"""Fully/semi-supervised 3D baseline (labels only) on patch queues
(reference: /root/reference/train_sup_3d.py)."""

import os

from ..config.datasets import dataset_cfg
from ..engine.loop import SupTrainer
from ..engine.state import TrainState
from ..engine.steps import make_eval_step, make_sup_train_step
from ..models import network_meta
from ..ops.losses import segmentation_loss
from ..utils.rundir import RunPaths, dump_config
from . import common, common3d


def add_args(parser):
    parser.add_argument("--load_weights", default=None, type=str)
    parser.add_argument("--load_hebbian_weights", default=None, type=str)
    parser.add_argument("--hebbian_rule", default="swta_t", type=str)
    parser.add_argument("--hebb_inv_temp", default=1, type=int)
    return parser


def run_dir_3d(args, algo=None):
    """train_sup_3d.py:85-93 tag scheme (algo-prefixed for semi 3D)."""
    ds = os.path.split(args.path_dataset)[1]
    net = args.network if algo is None else f"{algo}_{args.network}"
    if args.regime < 100:
        phase = "semi_sup"
        if getattr(args, "load_hebbian_weights", None):
            tag, inv = f"h_{net}_{args.hebbian_rule}", args.hebb_inv_temp
        elif getattr(args, "load_weights", None):
            tag, inv = net, 1
        else:
            tag, inv = f"{args.init_weights}_{net}", 1
    else:
        phase, tag, inv = "fully_sup", net, 1
    run = os.path.join(args.path_root_exp, ds, phase, tag,
                       f"inv_temp-{inv}", f"regime-{args.regime}",
                       f"run-{args.seed}")
    paths = RunPaths(
        run=run, checkpoints=os.path.join(run, "checkpoints"),
        tensorboard=os.path.join(run, "runs"),
        val_seg_preds=os.path.join(run, "val_seg_preds"),
        train_seg_preds=(os.path.join(run, "train_seg_preds")
                         if args.debug else None))
    import dataclasses
    for p in dataclasses.asdict(paths).values():
        if p is not None:
            os.makedirs(p, exist_ok=True)
    return paths


def build(args):
    cfg = dataset_cfg(args.dataset_name)
    paths = run_dir_3d(args)
    dump_config(paths, args)
    loaders = common3d.make_queues_3d(args, cfg)
    loaders = {"train": loaders["train"], "val": loaders["val"]}
    model, variables, hebb = common3d.build_model_3d(
        args, cfg, load_hebbian=args.load_hebbian_weights,
        load_weights=args.load_weights)
    tx = common.build_tx(args, steps_per_epoch=len(loaders["train"]))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    n_cls = cfg["NUM_CLASSES"]
    criterion = segmentation_loss(args.loss, False, num_classes=n_cls)
    meta = network_meta(args.network)
    train_step = make_sup_train_step(model, args.network, criterion, tx)
    eval_step = make_eval_step(model, args.network, criterion,
                               needs_rng=bool(meta["rngs"]))
    hebb_meta = {}
    if hebb is not None:
        hebb_meta = {"hebb_params": hebb.to_dict(),
                     "layers_excluded": list(hebb.exclude)}
    trainer = SupTrainer(
        model=model, state=state, train_step=train_step,
        eval_step=eval_step, loaders=loaders, num_classes=n_cls,
        paths=paths, args=args, hebb_meta=hebb_meta,
        palette=cfg["PALETTE"])
    trainer.prep = common3d.prep_batch_3d
    return trainer


def main(argv=None):
    parser = add_args(common3d.base_parser_3d())
    args = parser.parse_args(argv)
    return build(args).run()


if __name__ == "__main__":
    main()
