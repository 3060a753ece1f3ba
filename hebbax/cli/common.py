"""Shared CLI plumbing for the 2D trainers.

Keeps the reference's argparse surface per entry point
(/root/reference/train_sup_2d.py:31-63) while backing all scripts with the
same construction helpers: dataset/loader assembly, model + Hebbian
checkpoint hand-off, optimizer/schedule stack.
"""

import argparse
import os

import jax
import jax.numpy as jnp
from flax import traverse_util

from ..config.datasets import input_stats
from ..config.schedules import make_optimizer, warmup_step_schedule
from ..data import Loader, SegDataset2D
from ..hebb.spec import HebbSpec
from ..models import get_network
from ..utils.checkpoint import load_snapshot
from ..utils.seeding import init_seeds


def base_parser_2d(defaults=None):
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=0, type=int)  # kept for CLI parity
    p.add_argument("--path_root_exp", default="./runs")
    p.add_argument("--path_dataset", default="data/GlaS")
    p.add_argument("--dataset_name", default="GlaS")
    p.add_argument("--input1", default="image")
    p.add_argument("--regime", default=20, type=int)
    p.add_argument("-b", "--batch_size", default=2, type=int)
    p.add_argument("-e", "--num_epochs", default=200, type=int)
    p.add_argument("-s", "--step_size", default=50, type=int)
    p.add_argument("--optimizer", default="sgd", type=str)
    p.add_argument("-l", "--lr", default=0.5, type=float)
    p.add_argument("-g", "--gamma", default=0.5, type=float)
    p.add_argument("--loss", default="dice", type=str)
    p.add_argument("-ds", "--deep_supervision", default=False)
    p.add_argument("-w", "--warm_up_duration", default=20, type=int)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--wd", default=-5, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("-i", "--display_iter", default=1, type=int)
    p.add_argument("--validate_iter", default=2, type=int)
    p.add_argument("-n", "--network", default="unet_s2d", type=str)  # s2d: exact-parity TPU fast path (tests/test_s2d.py); reference default: unet
    p.add_argument("--debug", default=True)
    p.add_argument("--init_weights", default="kaiming", type=str)
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--dp_devices", default=1, type=int,
                   help="data-parallel devices (0 = all local devices)")
    p.add_argument("--profile_dir", default=None, type=str,
                   help="capture a jax.profiler trace of epoch 1 here")
    p.add_argument("--dtype", default="float32", type=str,
                   help="model compute dtype: float32 | bfloat16 (params stay f32)")
    p.add_argument("--resume", default=False,
                   help="write/consume a full resume checkpoint "
                        "(optimizer + epoch state; reference has none)")
    p.add_argument("--device_augment", default=False,
                   help="run the train augmentation inside the jitted "
                        "step (same distribution as the host pipeline; "
                        "removes the host-CPU bottleneck)")
    if defaults:
        p.set_defaults(**defaults)
    return p


def make_loaders_2d(args, cfg, sup=True, regime=None, splits=("train",
                                                              "val")):
    mean, std = input_stats(cfg, args.input1)
    loaders = {}
    regime = args.regime if regime is None else regime
    for split in splits:
        ds = SegDataset2D(
            os.path.join(args.path_dataset, "val" if split == "val"
                         else "train"),
            args.input1, mean, std, split=split, sup=sup,
            regime=regime if split == "train" else 100, seed=args.seed)
        loaders[split] = Loader(
            ds, args.batch_size, shuffle=(split == "train"),
            seed=args.seed, num_workers=args.num_workers)
    return loaders


def hebbian_finetune_spec(meta):
    """HebbSpec for fine-tuning from a Hebbian snapshot: alpha forced to 0
    (train_sup_2d.py:152-154)."""
    hp = dict(meta["hebb_params"])
    hp["alpha"] = 0.0
    return HebbSpec.from_dict(hp, exclude=meta.get("excluded_layers") or ())


def pretrain_base_network(name):
    """Map a folded (s2d) network name to its unfolded base for Hebbian
    pretraining.  The folded variants share the param tree exactly
    (tests/test_s2d*.py), so checkpoints hand off either way — but the
    Hebbian delta path does not fold and is measured SLOWER folded
    (unet3d_s2d 108.6 ms vs unet3d 90.7 bf16; same effect in 2D — see
    CLAUDE.md).  Fine-tuning may still use the folded variant."""
    base = name.replace("_s2d_batched", "").replace("_s2d", "")
    if base != name:
        from ..models import available_networks
        if base in available_networks():
            print(f"[hebbax] hebbian pretrain: running the unfolded "
                  f"'{base}' (param tree identical to '{name}'; the "
                  f"delta path does not fold — measured slower)")
            return base
    return name


def reinit_excluded(loaded_params, fresh_params, exclude):
    """Replace excluded-module params with freshly initialized values
    (train_sup_2d.py:160-166: excluded layers re-kaiming'd after load)."""
    flat = traverse_util.flatten_dict(loaded_params)
    fresh = traverse_util.flatten_dict(fresh_params)
    from ..hebb.spec import is_excluded
    for path in flat:
        if is_excluded(path[:-1], exclude):
            flat[path] = fresh[path]
    return traverse_util.unflatten_dict(flat)


def build_model_2d(args, cfg, load_hebbian=None, load_weights=None,
                   sample_shape=(2, 128, 128)):
    """Model + initial variables, handling the pretrain->fine-tune
    hand-off (train_sup_2d.py:148-172)."""
    init_seeds(args.seed)
    in_ch, n_cls = cfg["IN_CHANNELS"], cfg["NUM_CLASSES"]
    rngs = {"params": jax.random.PRNGKey(args.seed),
            "dropout": jax.random.PRNGKey(args.seed + 1),
            "perturb": jax.random.PRNGKey(args.seed + 2),
            "latent": jax.random.PRNGKey(args.seed + 3)}
    sample = jnp.zeros(sample_shape + (in_ch,), jnp.float32)

    hebb = None
    if load_hebbian:
        _, meta = load_snapshot(load_hebbian)
        hebb = hebbian_finetune_spec(meta)

    model = get_network(args.network, in_ch, n_cls,
                        init_type=args.init_weights, hebb=hebb,
                        dtype=model_dtype(args))
    variables = model.init(rngs, sample, train=False)

    if load_hebbian:
        loaded, meta = load_snapshot(load_hebbian)
        params = reinit_excluded(loaded["params"], variables["params"],
                                 hebb.exclude)
        variables = dict(variables)
        variables["params"] = params
        if "batch_stats" in loaded and "batch_stats" in variables:
            variables["batch_stats"] = loaded["batch_stats"]
    elif load_weights:
        loaded, _ = load_snapshot(load_weights)
        variables = dict(variables)
        new_params = dict(loaded["params"])
        # re-init the head like the reference (train_sup_2d.py:171)
        if "out_conv" in variables["params"]:
            new_params["out_conv"] = variables["params"]["out_conv"]
        variables["params"] = new_params
        if "batch_stats" in loaded:
            variables["batch_stats"] = loaded["batch_stats"]

    return model, variables, hebb


def build_tx(args, steps_per_epoch):
    """Optimizer + warmup/step schedule (train_sup_2d.py:180-188)."""
    schedule = warmup_step_schedule(
        args.lr, warmup=args.warm_up_duration, step_size=args.step_size,
        gamma=args.gamma, steps_per_epoch=steps_per_epoch)
    wd = 5 * 10 ** args.wd if args.optimizer == "sgd" else 0.0
    return make_optimizer(args.optimizer, schedule,
                          momentum=args.momentum, weight_decay=wd)


def prep_batch(batch):
    out = {"image": jnp.asarray(batch["image"])}
    if "mask" in batch:
        out["mask"] = jnp.asarray(batch["mask"])
    return out


def wrap_device_augment(train_step):
    """Compose on-device augmentation with a jitted train step
    (hebbax.ops.augment_device; key split so augmentation and model rngs
    stay independent)."""
    from ..ops.augment_device import augment_batch

    def wrapped(state, batch, key):
        ka, ks = jax.random.split(key)
        img, mask = augment_batch(ka, batch["image"], batch["mask"])
        return train_step(state, {"image": img, "mask": mask}, ks)

    return wrapped


def wrap_device_augment_semi(train_step, uamt=False):
    """Semi-step variant: augments both the labeled and unlabeled batch
    (the unlabeled one has no mask; a dummy mask rides along)."""
    from ..ops.augment_device import augment_batch

    def wrapped(state, sup_batch, unsup_batch, w, *rest):
        key = rest[-1]
        ka, kb, ks = jax.random.split(key, 3)
        img_s, mask_s = augment_batch(ka, sup_batch["image"],
                                      sup_batch["mask"])
        dummy = jnp.zeros(unsup_batch["image"].shape[:-1], jnp.int32)
        img_u, _ = augment_batch(kb, unsup_batch["image"], dummy)
        return train_step(state, {"image": img_s, "mask": mask_s},
                          {"image": img_u}, w, *rest[:-1], ks)

    return wrapped


def enable_device_augment(trainer, args, train_loader_key="train"):
    """Switch the train dataset(s) to resize+normalize only and wrap the
    step with on-device augmentation."""
    if not getattr(args, "device_augment", False):
        return trainer
    if train_loader_key in trainer.loaders:
        trainer.loaders[train_loader_key].dataset.host_augment = False
        trainer.train_step = wrap_device_augment(trainer.train_step)
    else:  # semi trainers: train_sup + train_unsup
        trainer.loaders["train_sup"].dataset.host_augment = False
        trainer.loaders["train_unsup"].dataset.host_augment = False
        trainer.train_step = wrap_device_augment_semi(trainer.train_step)
    return trainer


def model_dtype(args):
    """Resolve --dtype to a jnp dtype (None keeps f32 defaults)."""
    name = getattr(args, "dtype", "float32")
    if name in (None, "float32", "f32"):
        return None
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"unsupported dtype {name!r}")
