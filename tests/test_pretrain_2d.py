"""2D unsupervised pretrainer CLIs end-to-end (VERDICT r3 items #1/#2):
VAE, superpixel, and conditional-diffusion (superdiff) pretraining on a
tiny synthetic dataset, mirroring tests/test_pretrain_3d.py.

Reference entry points: pretrain_vae_unsup_2d.py,
pretrain_superpix_unsup_2d.py, pretrain_superdiff_unsup_2d.py.
"""

import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("GlaS")
    rng = np.random.default_rng(7)
    for split, n in (("train", 6), ("val", 2)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(n):
            yy, xx = np.mgrid[:32, :32]
            cy, cx = rng.integers(10, 22, 2)
            mask = ((yy - cy) ** 2 + (xx - cx) ** 2 < 49).astype(np.uint8)
            img = np.stack([mask * 160 + 50, mask * 100 + 70,
                            np.full_like(mask, 90)], -1).astype(np.uint8)
            img = img + rng.integers(0, 25, img.shape).astype(np.uint8)
            Image.fromarray(img).save(root / split / "image" / f"{i}.png")
            Image.fromarray(mask * 255).save(
                root / split / "mask" / f"{i}.png")
    return str(root)


def _run(kind, tiny_dataset, tmp_path, extra=()):
    from hebbax.cli.common import base_parser_2d
    from hebbax.cli.pretrain_unsup_2d import add_args, build

    args = add_args(base_parser_2d(), kind).parse_args([
        "--path_dataset", tiny_dataset, "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--batch_size", "2", "--num_epochs", "2",
        "--validate_iter", "1", "--lr", "1e-3", "--num_workers", "0",
        *extra])
    trainer = build(args, kind)
    for ld in trainer.loaders.values():
        ld.dataset.size = (32, 32)
    best = trainer.run()
    run = trainer.paths.run
    assert os.path.exists(os.path.join(run, "checkpoints", "last.ckpt"))
    assert 0.0 <= best[1] <= 1.0
    return pd.read_csv(os.path.join(run, "train_log.csv"))


@pytest.mark.slow  # CLI wiring; the VAE model/ELBO stay covered fast by
def test_pretrain_vae_2d(tiny_dataset, tmp_path):  # test_models/test_losses
    log = _run("vae", tiny_dataset, tmp_path)
    # the ELBO objective (trains the whole net) must decrease
    assert log["loss_unsup"].iloc[-1] < log["loss_unsup"].iloc[0]


def test_pretrain_superpix_2d(tiny_dataset, tmp_path):
    log = _run("superpix", tiny_dataset, tmp_path)
    assert np.isfinite(log["loss"].iloc[-1])
    assert np.isfinite(log["loss_unsup"].iloc[-1])


@pytest.mark.slow
def test_pretrain_superdiff_2d(tiny_dataset, tmp_path):
    log = _run("superdiff", tiny_dataset, tmp_path,
               extra=("--timestamp_diffusion", "8"))
    # reconstruction diffusion (trains both nets) must decrease; the
    # criterion-based superdiff metric must be logged and finite
    # (pretrain_superdiff_unsup_2d.py:193,205-207)
    assert log["loss_unsup"].iloc[-1] < log["loss_unsup"].iloc[0]
    assert np.isfinite(log["loss_superdiff"]).all()
    assert np.isfinite(log["loss"]).all()
