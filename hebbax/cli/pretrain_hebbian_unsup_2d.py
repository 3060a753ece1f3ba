"""Unsupervised Hebbian pretraining, 2D
(reference: /root/reference/pretrain_hebbian_unsup_2d.py).

Every non-excluded conv becomes Hebbian (static HebbSpec, no surgery);
the dice loss on the excluded head provides backprop grads only there;
Hebbian kernels update with grad = -delta (alpha=1) through the same
optimizer; everything else (BN affine, conv biases) is frozen via an
optimizer mask — replicating loss.backward(); local_update();
optimizer.step() (pretrain_hebbian_unsup_2d.py:188-195) in one jitted
step.  Snapshots embed hebb_params + excluded_layers for the fine-tune
hand-off (utils.py:32-40).
"""

import jax

from ..config.datasets import dataset_cfg
from ..engine.loop import SupTrainer
from ..engine.state import TrainState
from ..engine.steps import make_eval_step, make_sup_train_step
from ..hebb.spec import HebbSpec
from ..hebb.surgery import pretrain_trainable_mask
from ..models import get_network, network_meta
from ..ops.losses import segmentation_loss
from ..utils.rundir import dump_config, make_run_dir
from . import common


def add_args(parser):
    parser.add_argument("--exclude", nargs="*", default=["Conv_1x1"],
                        type=str)
    parser.add_argument("--hebb_mode", default="swta_t", type=str)
    parser.add_argument("--hebb_inv_temp", default=50.0, type=float)
    parser.add_argument("--hebb_w_nrm", default=True, type=bool)
    parser.add_argument("--hebb_alpha", default=1.0, type=float)
    parser.add_argument("--threshold", default=None, type=float)
    parser.set_defaults(optimizer="adam", regime=100)
    return parser


def build(args):
    args.network = common.pretrain_base_network(args.network)
    cfg = dataset_cfg(args.dataset_name)
    paths = make_run_dir(
        args.path_root_exp, args.path_dataset, "hebbian_unsup",
        f"{args.network}_{args.hebb_mode}", int(args.hebb_inv_temp),
        100, args.seed, debug=bool(args.debug))
    dump_config(paths, args)

    spec = HebbSpec(mode=args.hebb_mode, k=args.hebb_inv_temp,
                    w_nrm=bool(args.hebb_w_nrm), alpha=args.hebb_alpha,
                    exclude=tuple(args.exclude))

    loaders = common.make_loaders_2d(args, cfg, regime=100)
    in_ch, n_cls = cfg["IN_CHANNELS"], cfg["NUM_CLASSES"]
    from ..utils.seeding import init_seeds
    init_seeds(args.seed)
    rngs = {"params": jax.random.PRNGKey(args.seed),
            "dropout": jax.random.PRNGKey(args.seed + 1),
            "perturb": jax.random.PRNGKey(args.seed + 2),
            "latent": jax.random.PRNGKey(args.seed + 3)}
    import jax.numpy as jnp
    sample = jnp.zeros((args.batch_size, 128, 128, in_ch), jnp.float32)
    model = get_network(args.network, in_ch, n_cls, hebb=spec,
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
        # urpc/cct heads averaged unconditionally in the pretrainers
        # (pretrain_hebbian_unsup_2d.py:177-181)
        deep_supervision=meta["outputs"] == "deep4",
        hebb_alpha=spec.alpha, trainable_mask=mask,
        # alpha=1: backprop grads on converted kernels are scaled to zero,
        # so differentiate only the excluded head — trunk backward DCE'd.
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
    trainer.prep = common.prep_batch
    return trainer


def main(argv=None):
    parser = add_args(common.base_parser_2d())
    args = parser.parse_args(argv)
    trainer = build(args)
    return trainer.run()


if __name__ == "__main__":
    main()
