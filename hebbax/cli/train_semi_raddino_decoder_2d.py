"""Semi-supervised EM over a frozen RAD-DINO encoder with a trainable
transpose-conv decoder
(reference: /root/reference/train_semi_raddino_decoder_2d.py).

Images at 224^2; the ViT encoder runs under stop_gradient (the
reference's torch.inference_mode, :255-257); only the decoder trains.
HF weights are loaded when cached (offline environments fall back to the
random-init encoder — documented in hebbax.models.raddino).
"""

import os

import jax
import jax.numpy as jnp
import optax

from ..config.datasets import dataset_cfg
from ..engine.semi import SemiTrainer
from ..engine.state import TrainState
from ..models.raddino import (RadDinoDecoder, ViTEncoder,
                              load_hf_rad_dino_params,
                              reshape_patch_embeddings)
from ..ops.losses import entropy_loss, segmentation_loss
from ..utils.rundir import RunPaths, dump_config
from ..utils.seeding import init_seeds
from . import common


def add_args(parser):
    parser.add_argument("-u", "--unsup_weight", default=1.0, type=float)
    parser.add_argument("--load_weights", default=None, type=str)
    parser.add_argument("--load_hebbian_weights", default=None, type=str)
    parser.add_argument("--hebbian_rule", default="swta_t", type=str)
    parser.add_argument("--hebb_inv_temp", default=1, type=int)
    parser.set_defaults(network="raddino_decoder")
    return parser


def _paths(args):
    ds = os.path.split(args.path_dataset)[1]
    if args.regime < 100:
        tag = f"raddino_decoder_{args.network}"
        phase = "semi_sup"
    else:
        phase, tag = "fully_sup", f"raddino_decoder_{args.network}"
    run = os.path.join(args.path_root_exp, ds, phase, tag, "inv_temp-1",
                       f"regime-{args.regime}", f"run-{args.seed}")
    paths = RunPaths(run=run, checkpoints=os.path.join(run, "checkpoints"),
                     tensorboard=os.path.join(run, "runs"),
                     val_seg_preds=os.path.join(run, "val_seg_preds"))
    import dataclasses
    for p in dataclasses.asdict(paths).values():
        if p is not None:
            os.makedirs(p, exist_ok=True)
    return paths


def build(args, image_size=224):
    cfg = dataset_cfg(args.dataset_name)
    n_cls = cfg["NUM_CLASSES"]
    paths = _paths(args)
    dump_config(paths, args)
    init_seeds(args.seed)

    size = (image_size, image_size)
    sup_loaders = common.make_loaders_2d(args, cfg, sup=True)
    unsup_loaders = common.make_loaders_2d(args, cfg, sup=False,
                                           splits=("train",))
    loaders = {"train_sup": sup_loaders["train"], "val": sup_loaders["val"],
               "train_unsup": unsup_loaders["train"]}
    for ld in loaders.values():
        ld.dataset.size = size

    encoder = ViTEncoder()
    decoder = RadDinoDecoder(n_cls, out_size=image_size)
    key = jax.random.PRNGKey(args.seed)
    enc_params = encoder.init(
        {"params": key}, jnp.zeros((1,) + size + (3,)))["params"]
    enc_params, pretrained = load_hf_rad_dino_params(enc_params)
    if not pretrained:
        print("WARNING: microsoft/rad-dino weights unavailable (offline?) "
              "— the frozen ViT encoder runs with RANDOM init; decoder "
              "metrics will not be comparable to the reference's "
              "pretrained-encoder results")
    grid = image_size // encoder.patch
    dec_vars = decoder.init({"params": jax.random.fold_in(key, 1)},
                            jnp.zeros((1, grid, grid, encoder.dim)),
                            train=False)
    tx = common.build_tx(args, steps_per_epoch=len(loaders["train_sup"]))
    state = TrainState(params=dec_vars["params"],
                       batch_stats=dec_vars.get("batch_stats"),
                       opt_state=tx.init(dec_vars["params"]), step=0)
    criterion = segmentation_loss(args.loss, False, num_classes=n_cls)

    @jax.jit
    def embed(images):
        tokens = encoder.apply({"params": enc_params}, images)
        return jax.lax.stop_gradient(
            reshape_patch_embeddings(tokens, image_size, encoder.patch))

    def train_step(state, sup_batch, unsup_batch, w, key):
        emb_u = embed(unsup_batch["image"])
        emb_s = embed(sup_batch["image"])

        def loss_of(params):
            v = {"params": params}
            if state.batch_stats is not None:
                v["batch_stats"] = state.batch_stats
            pred_u, mut = decoder.apply(v, emb_u, train=True,
                                        mutable=["batch_stats"])
            loss_u = entropy_loss(jax.nn.softmax(pred_u, axis=-1),
                                  2) * w
            v2 = {"params": params, **mut}
            pred_s, mut = decoder.apply(v2, emb_s, train=True,
                                        mutable=["batch_stats"])
            loss_s = criterion(pred_s, sup_batch["mask"])
            return loss_s + loss_u, (pred_s, mut, loss_s, loss_u)

        (_, (pred_s, mut, loss_s, loss_u)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params,
                                  batch_stats=mut.get("batch_stats"),
                                  opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss_s + loss_u, "loss_sup": loss_s,
                           "loss_unsup": loss_u, "logits": pred_s}

    train_step = jax.jit(train_step, donate_argnums=(0,))

    @jax.jit
    def eval_step(variables, batch, key=None):
        emb = embed(batch["image"])
        logits = decoder.apply(variables, emb, train=False)
        out = {"logits": logits}
        if "mask" in batch:
            out["loss"] = criterion(logits, batch["mask"])
        return out

    trainer = SemiTrainer(
        model=decoder, state=state, train_step=train_step,
        eval_step=eval_step, loaders=loaders, num_classes=n_cls,
        paths=paths, args=args, palette=cfg["PALETTE"],
        unsup_weight=args.unsup_weight)
    trainer.prep = common.prep_batch
    trainer.encoder_pretrained = pretrained
    return trainer


def main(argv=None):
    parser = add_args(common.base_parser_2d())
    args = parser.parse_args(argv)
    return build(args).run()


if __name__ == "__main__":
    main()
