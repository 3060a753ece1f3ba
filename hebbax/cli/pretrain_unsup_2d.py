"""Unsupervised pretrainers with a supervised probe head, 2D:
VAE ELBO (pretrain_vae_unsup_2d.py), superpixel prediction
(pretrain_superpix_unsup_2d.py), and conditional diffusion
(pretrain_superdiff_unsup_2d.py).

Gradient protocol (reset_internal_grads parity): the probe segm loss
trains ONLY the head; the unsupervised objective trains everything.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from ..config.datasets import dataset_cfg
from ..engine.loop import SupTrainer
from ..engine.state import TrainState
from ..engine.steps import (_model_rngs, head_only_mask, make_eval_step,
                            make_probe_pretrain_step)
from ..models import get_network, network_meta
from ..ops import diffusion as diff
from ..ops.losses import elbo_metric, segmentation_loss
from ..ops.superpix import superpix_batch
from ..utils.rundir import RunPaths, dump_config
from ..utils.seeding import init_seeds
from . import common

PHASES = {"vae": "vae_unsup", "superpix": "superpix_unsup",
          "superdiff": "superdiff_unsup"}
NETWORK_DEFAULT = {"vae": "unet_vae", "superpix": "unet_superpix",
                   "superdiff": "unet_ddpm"}
HEADS = {"vae": ("out_conv",), "superpix": ("out_conv",),
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


def _merge_stats(base, mut):
    if not mut:
        return base
    flat = traverse_util.flatten_dict(base or {})
    flat.update(traverse_util.flatten_dict(mut))
    return traverse_util.unflatten_dict(flat)


def make_superdiff_step(model, criterion, tx, n_cls, timesteps=1000):
    """pretrain_superdiff_unsup_2d.py:186-205: pseudo mask from the
    pred_x0 seg diffusion (loss logged, not trained), reconstruction
    diffusion conditioned on the pseudo mask trains both nets (gradient
    flows through the pseudo), dice probe trains final_conv only."""
    sched_seg = diff.make_schedule(timesteps, "pred_x0")
    sched_img = diff.make_schedule(timesteps, "pred_noise")

    def step(state: TrainState, batch, key):
        head_mask = head_only_mask(state.params, ("final_conv",))
        k1, k2, k3 = jax.random.split(key, 3)
        img, mask = batch["image"], batch["mask"]

        def losses_of(params):
            bs = state.batch_stats
            stats = {"bs": bs}

            def apply_mode(mode, x, t, k):
                v = {"params": params}
                if stats["bs"] is not None:
                    v["batch_stats"] = stats["bs"]
                out, mut = model.apply(
                    v, x, t, mode=mode, train=True, rngs=_model_rngs(k),
                    mutable=["batch_stats"])
                stats["bs"] = _merge_stats(stats["bs"],
                                           mut.get("batch_stats"))
                return out

            # reference passes loss_fn=criterion and the garbled
            # conditioner 'img) #' (behaves as 'img') at
            # pretrain_superdiff_unsup_2d.py:193
            loss_sdiff, pseudo = diff.super_forward(
                sched_seg, lambda x, t: apply_mode("net_seg", x, t, k1),
                img, jnp.zeros_like(mask), k1, n_cls, conditioner="img",
                loss_fn=criterion)
            loss_rec, _ = diff.super_forward(
                sched_img, lambda x, t: apply_mode("net", x, t, k2),
                img, pseudo, k2, n_cls, conditioner="target")
            v = {"params": params}
            if stats["bs"] is not None:
                v["batch_stats"] = stats["bs"]
            probe = model.apply(v, pseudo, mode="probe", train=True,
                                rngs=_model_rngs(k3))
            loss_probe = criterion(probe, mask)
            return (loss_probe, loss_rec), (probe, stats["bs"], loss_sdiff)

        (probe_loss, rec_loss), pull, (probe, bs, loss_sdiff) = jax.vjp(
            losses_of, state.params, has_aux=True)
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        g_probe = pull((one, zero))[0]
        g_rec = pull((zero, one))[0]
        fu = traverse_util.flatten_dict(g_rec)
        fp = traverse_util.flatten_dict(g_probe)
        fm = traverse_util.flatten_dict(head_mask)
        grads = traverse_util.unflatten_dict(
            {p: fu[p] + fp[p] if fm[p] else fu[p] for p in fu})
        import optax
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=bs,
                                  opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": probe_loss, "loss_unsup": rec_loss,
                           "loss_superdiff": loss_sdiff, "logits": probe}

    return jax.jit(step, donate_argnums=(0,))


def build(args, kind):
    cfg = dataset_cfg(args.dataset_name)
    n_cls = cfg["NUM_CLASSES"]
    paths = _paths(args, kind)
    dump_config(paths, args)
    loaders = common.make_loaders_2d(args, cfg, regime=100)
    init_seeds(args.seed)
    in_ch = cfg["IN_CHANNELS"]
    rngs = {"params": jax.random.PRNGKey(args.seed),
            "dropout": jax.random.PRNGKey(args.seed + 1),
            "latent": jax.random.PRNGKey(args.seed + 3)}
    model = get_network(args.network, in_ch, n_cls,
                        dtype=common.model_dtype(args))
    sample = jnp.zeros((args.batch_size, 128, 128, in_ch), jnp.float32)
    if kind == "superdiff":
        variables = model.init(rngs, jnp.zeros(
            (args.batch_size, 128, 128, n_cls)), mode="probe", train=False)
        # also initialize both diffusion nets
        for mode, ch in (("net", in_ch), ("net_seg", n_cls)):
            v2 = model.init(
                rngs, jnp.zeros((args.batch_size, 128, 128, in_ch + n_cls)),
                jnp.zeros((args.batch_size,), jnp.int32), mode=mode,
                train=False)
            merged_p = dict(v2["params"])
            merged_p.update(variables["params"])
            variables = {"params": merged_p,
                         "batch_stats": _merge_stats(
                             variables.get("batch_stats"),
                             v2.get("batch_stats"))}
    else:
        variables = model.init(rngs, sample, train=False)

    tx = common.build_tx(args, steps_per_epoch=len(loaders["train"]))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    criterion = segmentation_loss(args.loss, False, num_classes=n_cls)
    meta = network_meta(args.network)

    if kind == "vae":
        def unsup(outputs, batch):
            return elbo_metric(outputs, batch["image"],
                               weight=batch.get("weight"))

        train_step = make_probe_pretrain_step(
            model, args.network, criterion, tx, unsup,
            head_names=HEADS[kind])
    elif kind == "superpix":
        def unsup(outputs, batch):
            return criterion(outputs[1], batch["mask_superpix"])

        train_step = make_probe_pretrain_step(
            model, args.network, criterion, tx, unsup,
            head_names=HEADS[kind])
    else:
        train_step = make_superdiff_step(model, criterion, tx, n_cls,
                                         args.timestamp_diffusion)

    if kind == "superdiff":
        # validation probes the pseudo-mask path is expensive; evaluate the
        # probe on the seg diffusion pseudo masks like training
        sched_seg = diff.make_schedule(args.timestamp_diffusion, "pred_x0")

        def eval_step(variables, batch, key=None):
            key = key if key is not None else jax.random.PRNGKey(0)
            img = batch["image"]

            def apply_seg(x, t):
                return model.apply(variables, x, t, mode="net_seg",
                                   train=False)

            _, pseudo = diff.super_forward(
                sched_seg, apply_seg, img,
                jnp.zeros(img.shape[:-1], jnp.int32), key, n_cls,
                conditioner="img")
            logits = model.apply(variables, pseudo, mode="probe",
                                 train=False)
            out = {"logits": logits}
            if "mask" in batch:
                out["loss"] = criterion(logits, batch["mask"])
            return out

        eval_step = jax.jit(eval_step)
    else:
        eval_step = make_eval_step(model, args.network, criterion,
                                   needs_rng=True)

    trainer = SupTrainer(
        model=model, state=state, train_step=train_step,
        eval_step=eval_step, loaders=loaders, num_classes=n_cls,
        paths=paths, args=args, palette=cfg["PALETTE"])

    if kind == "superpix":
        import zlib
        seed = args.seed

        def prep(batch):
            b = common.prep_batch(batch)
            # deterministic per-batch seed (python hash() is salted)
            digest = zlib.crc32(np.asarray(
                batch["image"], np.float32)[0, :4, :4].tobytes())
            rng = np.random.default_rng(
                np.random.SeedSequence([seed, digest]))
            b["mask_superpix"] = jnp.asarray(
                superpix_batch(rng, np.asarray(batch["image"])).astype(
                    np.int32))
            return b

        trainer.prep = prep
    else:
        trainer.prep = common.prep_batch
    return trainer


def main(kind, argv=None):
    parser = add_args(common.base_parser_2d(), kind)
    args = parser.parse_args(argv)
    return build(args, kind).run()
