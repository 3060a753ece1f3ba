"""Fully/semi-supervised 2D baseline trainer (labels only).

CLI + behavior parity: /root/reference/train_sup_2d.py (369 LoC loop,
restructured onto the shared jitted-step harness).
"""

from ..engine.loop import SupTrainer
from ..engine.state import TrainState
from ..engine.steps import make_eval_step, make_sup_train_step
from ..config.datasets import dataset_cfg
from ..models import network_meta
from ..ops.losses import segmentation_loss
from ..utils.rundir import dump_config, make_run_dir, sup_run_tag
from . import common


def add_args(parser):
    parser.add_argument("--load_weights", default=None, type=str)
    parser.add_argument("--load_hebbian_weights", default=None, type=str)
    parser.add_argument("--hebbian_rule", default="swta_t", type=str)
    parser.add_argument("--hebb_inv_temp", default=1, type=int)
    return parser


def build(args):
    cfg = dataset_cfg(args.dataset_name)
    phase, tag, inv_temp = sup_run_tag(args)
    paths = make_run_dir(args.path_root_exp, args.path_dataset, phase, tag,
                         inv_temp, args.regime, args.seed,
                         debug=bool(args.debug))
    dump_config(paths, args)

    loaders = common.make_loaders_2d(args, cfg)
    model, variables, hebb = common.build_model_2d(
        args, cfg, load_hebbian=args.load_hebbian_weights,
        load_weights=args.load_weights,
        sample_shape=(args.batch_size, 128, 128))
    # the schedule steps per epoch like the reference's scheduler.step()
    tx = common.build_tx(args, steps_per_epoch=len(loaders["train"]))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)

    criterion = segmentation_loss(args.loss, False,
                                  num_classes=cfg["NUM_CLASSES"])
    meta = network_meta(args.network)
    train_step = make_sup_train_step(
        model, args.network, criterion, tx,
        deep_supervision=bool(args.deep_supervision))
    eval_step = make_eval_step(model, args.network, criterion,
                               needs_rng=bool(meta["rngs"]))

    hebb_meta = {}
    if hebb is not None:
        hebb_meta = {"hebb_params": hebb.to_dict(),
                     "layers_excluded": list(hebb.exclude)}

    trainer = SupTrainer(
        model=model, state=state, train_step=train_step,
        eval_step=eval_step, loaders=loaders,
        num_classes=cfg["NUM_CLASSES"], paths=paths, args=args,
        hebb_meta=hebb_meta, palette=cfg["PALETTE"])
    _prep = trainer.prep

    def prep(batch):
        b = common.prep_batch(batch)
        return b
    trainer.prep = prep
    common.enable_device_augment(trainer, args)
    return trainer


def main(argv=None):
    parser = add_args(common.base_parser_2d())
    args = parser.parse_args(argv)
    trainer = build(args)
    return trainer.run()


if __name__ == "__main__":
    main()
