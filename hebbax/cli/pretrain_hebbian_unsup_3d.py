"""Unsupervised Hebbian pretraining, 3D
(reference: /root/reference/pretrain_hebbian_unsup_3d.py; defaults
--exclude ['conv'], patch queues instead of image folders)."""

import jax
import jax.numpy as jnp

from ..config.datasets import dataset_cfg
from ..engine.loop import SupTrainer
from ..engine.state import TrainState
from ..engine.steps import make_eval_step, make_sup_train_step
from ..hebb.spec import HebbSpec
from ..hebb.surgery import pretrain_trainable_mask
from ..models import get_network, network_meta
from ..ops.losses import segmentation_loss
from ..utils.rundir import RunPaths, dump_config
from ..utils.seeding import init_seeds
from . import common, common3d


def add_args(parser):
    parser.add_argument("--exclude", nargs="*", default=["conv"], type=str)
    parser.add_argument("--hebb_mode", default="swta_t", type=str)
    parser.add_argument("--hebb_inv_temp", default=50.0, type=float)
    parser.add_argument("--hebb_w_nrm", default=True, type=bool)
    parser.add_argument("--hebb_alpha", default=1.0, type=float)
    parser.add_argument("--threshold", default=None, type=float)
    parser.set_defaults(optimizer="adam", regime=100)
    return parser


def build(args):
    import os

    args.network = common.pretrain_base_network(args.network)
    cfg = dataset_cfg(args.dataset_name)
    n_cls = cfg["NUM_CLASSES"]
    run = os.path.join(
        args.path_root_exp, os.path.split(args.path_dataset)[1],
        "hebbian_unsup", f"{args.network}_{args.hebb_mode}",
        f"inv_temp-{int(args.hebb_inv_temp)}", "regime-100",
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
    dump_config(paths, args)

    spec = HebbSpec(mode=args.hebb_mode, k=args.hebb_inv_temp,
                    w_nrm=bool(args.hebb_w_nrm), alpha=args.hebb_alpha,
                    exclude=tuple(args.exclude))
    loaders = common3d.make_queues_3d(args, cfg)
    init_seeds(args.seed)
    ps = common3d.parse_patch_size(args)
    rngs = {"params": jax.random.PRNGKey(args.seed),
            "dropout": jax.random.PRNGKey(args.seed + 1),
            "perturb": jax.random.PRNGKey(args.seed + 2)}
    sample = jnp.zeros((1,) + ps + (cfg["IN_CHANNELS"],), jnp.float32)
    model = get_network(args.network, cfg["IN_CHANNELS"], n_cls, hebb=spec,
                        dtype=common.model_dtype(args))
    variables = model.init(rngs, sample, train=False)

    tx = common.build_tx(args, steps_per_epoch=len(loaders["train"]))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    criterion = segmentation_loss(args.loss, False, num_classes=n_cls)
    meta = network_meta(args.network)
    mask = pretrain_trainable_mask(variables["params"], spec.exclude)
    train_step = make_sup_train_step(
        model, args.network, criterion, tx,
        deep_supervision=meta["outputs"] == "deep4",
        hebb_alpha=spec.alpha, trainable_mask=mask,
        backprop_only=spec.exclude if spec.alpha == 1.0 else None)
    eval_step = make_eval_step(model, args.network, criterion,
                               needs_rng=bool(meta["rngs"]))
    hebb_meta = {"hebb_params": spec.to_dict(),
                 "layers_excluded": list(spec.exclude)}
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
