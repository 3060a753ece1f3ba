"""Shared CLI plumbing for the 3D trainers
(reference arg surface: /root/reference/train_sup_3d.py:35-66)."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.volumes3d import PatchQueue, VolumeDataset3D
from ..models import get_network
from ..utils.checkpoint import load_snapshot
from ..utils.seeding import init_seeds
from .common import hebbian_finetune_spec, model_dtype, reinit_excluded


def base_parser_3d(defaults=None):
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=0, type=int)
    p.add_argument("--path_root_exp", default="./runs")
    p.add_argument("--path_dataset", default="data/Atrial")
    p.add_argument("--dataset_name", default="Atrial")
    p.add_argument("--input1", default="image")
    p.add_argument("--regime", default=20, type=int)
    p.add_argument("-b", "--batch_size", default=1, type=int)
    p.add_argument("-e", "--num_epochs", default=200, type=int)
    p.add_argument("-s", "--step_size", default=50, type=int)
    p.add_argument("--optimizer", default="sgd", type=str)
    p.add_argument("-l", "--lr", default=0.1, type=float)
    p.add_argument("-g", "--gamma", default=0.5, type=float)
    p.add_argument("--patch_size", default=(96, 96, 80))
    p.add_argument("--loss", default="dice", type=str)
    p.add_argument("-w", "--warm_up_duration", default=20, type=int)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--wd", default=-5, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("-i", "--display_iter", default=1, type=int)
    p.add_argument("--validate_iter", default=2, type=int)
    p.add_argument("--queue_length", default=48, type=int)
    p.add_argument("--samples_per_volume_train", default=4, type=int)
    p.add_argument("--samples_per_volume_val", default=8, type=int)
    p.add_argument("-n", "--network", default="unet3d_s2d", type=str)  # s2d: exact-parity TPU fast path (tests/test_unet3d_s2d.py); reference default: unet3d
    p.add_argument("--debug", default=False)
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
    if defaults:
        p.set_defaults(**defaults)
    return p


def parse_patch_size(args):
    if isinstance(args.patch_size, str):
        args.patch_size = tuple(
            int(x) for x in args.patch_size.strip("()").split(","))
    args.patch_size = tuple(args.patch_size)
    return args.patch_size


def make_queues_3d(args, cfg, sup=True, sdf=False, splits=("train", "val")):
    """tio Queue-parity patch loaders (train_sup_3d.py:129-152)."""
    normalize = cfg.get("NORMALIZE", "mean")
    queues = {}
    for split in splits:
        sub = "val" if split == "val" else "train"
        ds = VolumeDataset3D(
            os.path.join(args.path_dataset, sub), args.input1,
            split=split, sup=True if split == "val" else sup,
            regime=args.regime if split == "train" else 100,
            seed=args.seed, normalize=normalize,
            num_classes=cfg["NUM_CLASSES"], sdf=sdf and split == "train",
            fmt=cfg.get("FORMAT", ".nrrd"))
        spv = (args.samples_per_volume_train if split == "train"
               else args.samples_per_volume_val)
        queues[split] = PatchQueue(
            ds, parse_patch_size(args), batch_size=args.batch_size,
            samples_per_volume=spv, max_length=args.queue_length,
            seed=args.seed, shuffle_subjects=(split == "train"),
            shuffle_patches=(split == "train"))
    return queues


def build_model_3d(args, cfg, load_hebbian=None, load_weights=None):
    init_seeds(args.seed)
    in_ch, n_cls = cfg["IN_CHANNELS"], cfg["NUM_CLASSES"]
    rngs = {"params": jax.random.PRNGKey(args.seed),
            "dropout": jax.random.PRNGKey(args.seed + 1),
            "perturb": jax.random.PRNGKey(args.seed + 2)}
    ps = parse_patch_size(args)
    sample = jnp.zeros((1,) + ps + (in_ch,), jnp.float32)

    hebb = None
    if load_hebbian:
        _, meta = load_snapshot(load_hebbian)
        hebb = hebbian_finetune_spec(meta)
    model = get_network(args.network, in_ch, n_cls,
                        init_type=args.init_weights, hebb=hebb,
                        dtype=model_dtype(args))
    variables = model.init(rngs, sample, train=False)
    if load_hebbian:
        loaded, _ = load_snapshot(load_hebbian)
        variables = dict(variables)
        variables["params"] = reinit_excluded(
            loaded["params"], variables["params"], hebb.exclude)
        if "batch_stats" in loaded and "batch_stats" in variables:
            variables["batch_stats"] = loaded["batch_stats"]
    elif load_weights:
        loaded, _ = load_snapshot(load_weights)
        variables = dict(variables)
        variables["params"] = loaded["params"]
        if "batch_stats" in loaded:
            variables["batch_stats"] = loaded["batch_stats"]
    return model, variables, hebb


def prep_batch_3d(batch):
    out = {"image": jnp.asarray(
        np.asarray(batch["image"], np.float32)[..., None])}
    if "mask" in batch:
        out["mask"] = jnp.asarray(np.asarray(batch["mask"], np.int32))
    for k in ("mask_sdf", "mask_sdf2"):
        if k in batch:
            out[k] = jnp.asarray(np.asarray(batch[k], np.float32))
    return out
