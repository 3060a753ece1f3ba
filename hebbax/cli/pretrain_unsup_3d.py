"""Unsupervised pretrainers with a probe head, 3D: VAE, superpixel,
diffusion (reference: pretrain_{vae,superpix,superdiff}_unsup_3d.py).

The reference's 3D VAE/superpix scripts are broken (they default to a
plain unet3d whose output the loops cannot unpack,
pretrain_vae_unsup_3d.py:56,180-182); here they run against the properly
wired unet3d_vae / unet3d_superpix models.  The 3D superdiff script
trains the 2D DDPM on the central z-slice of each patch
(pretrain_superdiff_unsup_3d.py:188) — replicated.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config.datasets import dataset_cfg
from ..engine.loop import SupTrainer
from ..engine.state import TrainState
from ..engine.steps import make_eval_step, make_probe_pretrain_step
from ..models import get_network
from ..ops.losses import elbo_metric, segmentation_loss
from ..ops.superpix import superpix_batch
from ..utils.rundir import RunPaths, dump_config
from ..utils.seeding import init_seeds
from . import common, common3d
from .pretrain_unsup_2d import PHASES, make_superdiff_step

NETWORK_DEFAULT = {"vae": "unet3d_vae", "superpix": "unet3d_superpix",
                   "superdiff": "unet_ddpm"}
HEADS_3D = {"vae": ("conv",), "superpix": ("conv",),
            "superdiff": ("final_conv",)}


def add_args(parser, kind):
    parser.add_argument("--threshold", default=None, type=float)
    parser.add_argument("--thr_interval", default=0.02, type=float)
    if kind == "superdiff":
        parser.add_argument("--timestamp_diffusion", default=1000,
                            type=int)
    parser.set_defaults(optimizer="adam", regime=100,
                        network=NETWORK_DEFAULT[kind])
    return parser


def _paths(args, kind):
    run = os.path.join(
        args.path_root_exp, os.path.split(args.path_dataset)[1],
        PHASES[kind], args.network, "inv_temp-1", "regime-100",
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


def build(args, kind):
    cfg = dataset_cfg(args.dataset_name)
    n_cls = cfg["NUM_CLASSES"]
    paths = _paths(args, kind)
    dump_config(paths, args)
    loaders = common3d.make_queues_3d(args, cfg)
    init_seeds(args.seed)
    in_ch = cfg["IN_CHANNELS"]
    ps = common3d.parse_patch_size(args)
    rngs = {"params": jax.random.PRNGKey(args.seed),
            "dropout": jax.random.PRNGKey(args.seed + 1),
            "latent": jax.random.PRNGKey(args.seed + 3)}

    criterion = segmentation_loss(args.loss, False, num_classes=n_cls)

    if kind == "superdiff":
        # 2D DDPM on the central slice
        model = get_network("unet_ddpm", in_ch, n_cls,
                            dtype=common.model_dtype(args))
        variables = model.init(
            rngs, jnp.zeros((args.batch_size, ps[0], ps[1], n_cls)),
            mode="probe", train=False)
        from .pretrain_unsup_2d import _merge_stats
        for mode in ("net", "net_seg"):
            v2 = model.init(
                rngs,
                jnp.zeros((args.batch_size, ps[0], ps[1], in_ch + n_cls)),
                jnp.zeros((args.batch_size,), jnp.int32), mode=mode,
                train=False)
            merged_p = dict(v2["params"])
            merged_p.update(variables["params"])
            variables = {"params": merged_p,
                         "batch_stats": _merge_stats(
                             variables.get("batch_stats"),
                             v2.get("batch_stats"))}
        tx = common.build_tx(args, steps_per_epoch=len(loaders["train"]))
        train_step = make_superdiff_step(model, criterion, tx, n_cls,
                                         args.timestamp_diffusion)
        from ..ops import diffusion as diff
        sched_seg = diff.make_schedule(args.timestamp_diffusion, "pred_x0")

        @jax.jit
        def eval_step(variables, batch, key=None):
            key = key if key is not None else jax.random.PRNGKey(0)
            img = batch["image"]
            _, pseudo = diff.super_forward(
                sched_seg,
                lambda x, t: model.apply(variables, x, t, mode="net_seg",
                                         train=False),
                img, jnp.zeros(img.shape[:-1], jnp.int32), key, n_cls,
                conditioner="img")
            logits = model.apply(variables, pseudo, mode="probe",
                                 train=False)
            out = {"logits": logits}
            if "mask" in batch:
                out["loss"] = criterion(logits, batch["mask"])
            return out
    else:
        model = get_network(args.network, in_ch, n_cls,
                            dtype=common.model_dtype(args))
        sample = jnp.zeros((args.batch_size,) + ps + (in_ch,), jnp.float32)
        variables = model.init(rngs, sample, train=False)
        tx = common.build_tx(args, steps_per_epoch=len(loaders["train"]))
        if kind == "vae":
            def unsup(outputs, batch):
                return elbo_metric(outputs, batch["image"],
                                   weight=batch.get("weight"))
        else:
            def unsup(outputs, batch):
                return criterion(outputs[1], batch["mask_superpix"])
        train_step = make_probe_pretrain_step(
            model, args.network, criterion, tx, unsup,
            head_names=HEADS_3D[kind])
        eval_step = make_eval_step(model, args.network, criterion,
                                   needs_rng=True)

    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    trainer = SupTrainer(
        model=model, state=state, train_step=train_step,
        eval_step=eval_step, loaders=loaders, num_classes=n_cls,
        paths=paths, args=args, palette=cfg["PALETTE"])

    if kind == "superdiff":
        def prep(batch):
            b = common3d.prep_batch_3d(batch)
            z = b["image"].shape[3] // 2  # central slice (B,X,Y,Z,1)
            out = {"image": b["image"][:, :, :, z, :]}
            if "mask" in b:
                out["mask"] = b["mask"][:, :, :, z]
            return out
        trainer.prep = prep
    elif kind == "superpix":
        import zlib
        seed = args.seed

        def prep(batch):
            b = common3d.prep_batch_3d(batch)
            # deterministic per-batch seed (python hash() is salted)
            digest = zlib.crc32(np.asarray(
                batch["image"], np.float32)[0, :2, :2, :2].tobytes())
            rng = np.random.default_rng(
                np.random.SeedSequence([seed, digest]))
            b["mask_superpix"] = jnp.asarray(superpix_batch(
                rng, np.asarray(batch["image"], np.float32), nd=3).astype(
                    np.int32))
            return b
        trainer.prep = prep
    else:
        trainer.prep = common3d.prep_batch_3d
    return trainer


def main(kind, argv=None):
    parser = add_args(common3d.base_parser_3d(), kind)
    args = parser.parse_args(argv)
    return build(args, kind).run()
