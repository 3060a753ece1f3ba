"""Coverage for reproduce-script paths not hit elsewhere: Hebbian
pretraining of the deep-supervision backbone (unet_urpc, averaged heads)
and training on wavelet-variant inputs (--input1 HAAR_H with the
MEAN_HAAR_* stats)."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("GlaS")
    rng = np.random.default_rng(10)
    for split, n in (("train", 4), ("val", 2)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(n):
            yy, xx = np.mgrid[:32, :32]
            cy, cx = rng.integers(12, 20, 2)
            m = ((yy - cy) ** 2 + (xx - cx) ** 2 < 49).astype(np.uint8)
            Image.fromarray(np.stack([m * 150 + 50] * 3, -1).astype(
                np.uint8)).save(root / split / "image" / f"{i}.png")
            Image.fromarray(m * 255).save(root / split / "mask" / f"{i}.png")
    return str(root)


@pytest.mark.parametrize("network", [
    pytest.param("unet_urpc", marks=pytest.mark.slow),  # same CLI path;
    "unet_urpc_s2d",  # the folded twin stays fast and compiles quicker
])
def test_hebbian_pretrain_urpc_backbone(tiny_dataset, tmp_path, network):
    """pretrain_hebbian_unsup_2d with unet_urpc (and its folded twin):
    4 deep-supervision heads averaged unconditionally
    (pretrain_hebbian_unsup_2d.py:177-181), heads excluded per the
    reproduce script's EXCLUDE_LAYER list."""
    from hebbax.cli.common import base_parser_2d
    from hebbax.cli import pretrain_hebbian_unsup_2d as pre

    args = pre.add_args(base_parser_2d()).parse_args([
        "--path_dataset", tiny_dataset, "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--network", network,
        "--batch_size", "2", "--num_epochs", "2", "--validate_iter", "1",
        "--lr", "1e-5", "--num_workers", "2",
        "--exclude", "out_conv_dp1", "out_conv_dp2", "out_conv_dp3",
        "out_conv",
        "--hebb_mode", "swta_t", "--hebb_inv_temp", "20",
    ])
    trainer = pre.build(args)
    # folded (s2d) nets are remapped to their unfolded base for Hebbian
    # pretraining (common.pretrain_base_network): the delta path does
    # not fold and is measured slower folded; the param trees are
    # identical so fine-tune handoff still accepts either variant
    assert args.network == "unet_urpc"
    assert "unet_urpc_swta_t" in trainer.paths.run
    for ld in trainer.loaders.values():
        ld.dataset.size = (32, 32)
    best = trainer.run()
    assert 0.0 <= best[1] <= 1.0
    from hebbax.utils.checkpoint import load_snapshot
    _, meta = load_snapshot(os.path.join(trainer.paths.checkpoints,
                                         "last.ckpt"))
    assert "out_conv_dp2" in meta["excluded_layers"]


def test_pretrain_cli_threads_dtype(tiny_dataset, tmp_path):
    """--dtype bfloat16 must reach the model in the pretrain CLIs
    (regression: the flag was recorded in config.json but the model was
    built f32, making the two dtypes silently identical)."""
    import jax
    import jax.numpy as jnp

    from hebbax.cli.common import base_parser_2d
    from hebbax.cli import pretrain_hebbian_unsup_2d as pre

    args = pre.add_args(base_parser_2d()).parse_args([
        "--path_dataset", tiny_dataset, "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--batch_size", "2", "--num_epochs", "1",
        "--num_workers", "2", "--dtype", "bfloat16",
    ])
    trainer = pre.build(args)
    # jit: an eager UNet apply pays per-op CPU compiles (~15 s)
    out = jax.jit(lambda v, x: trainer.model.apply(v, x, train=False))(
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        jnp.zeros((1, 32, 32, 3)))
    assert out.dtype == jnp.bfloat16
    # params stay f32
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert leaf.dtype == jnp.float32


@pytest.mark.slow  # trains a full CLI on generated wavelets; the wavelet
def test_wavelet_input_variant(tiny_dataset, tmp_path):  # filterbanks
    # themselves keep fast coverage in test_tools.py
    """Generate HAAR_H inputs with the wavelet tool, then train with
    --input1 HAAR_H so stats resolve via MEAN_HAAR_H
    (train_sup_2d.py:110-115; grayscale wavelets are RGB-expanded and the
    1-channel stats broadcast, like the reference's PIL convert + A.Normalize)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "w2d", "/root/repo/tools/wavelet2D.py")
    w2d = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(w2d)
    for split in ("train", "val"):
        w2d.main(["--image_path", os.path.join(tiny_dataset, split,
                                               "image"),
                  "--L_path", os.path.join(tiny_dataset, split, "HAAR_L"),
                  "--H_path", os.path.join(tiny_dataset, split, "HAAR_H"),
                  "--wavelet_type", "haar", "--if_RGB", "1"])

    from hebbax.cli.common import base_parser_2d
    from hebbax.cli.train_sup_2d import add_args, build
    args = add_args(base_parser_2d()).parse_args([
        "--path_dataset", tiny_dataset, "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--input1", "HAAR_H",
        "--regime", "100", "--batch_size", "2", "--num_epochs", "2",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-3",
        "--num_workers", "2",
    ])
    trainer = build(args)
    for ld in trainer.loaders.values():
        ld.dataset.size = (32, 32)
    best = trainer.run()
    assert 0.0 <= best[1] <= 1.0
