"""End-to-end smoke tests: tiny synthetic dataset -> train_sup_2d
equivalent run -> artifacts + learning signal (SURVEY.md section 4,
level 3)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from hebbax.data import Loader, SegDataset2D, regime_split


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """8 train / 4 val images, 32x32 RGB with circular masks."""
    root = tmp_path_factory.mktemp("GlaS")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(n):
            yy, xx = np.mgrid[:32, :32]
            cy, cx = rng.integers(8, 24, 2)
            mask = ((yy - cy) ** 2 + (xx - cx) ** 2 < 64).astype(np.uint8)
            img = np.stack([mask * 180 + 40, mask * 120 + 60,
                            np.full_like(mask, 90)], -1).astype(np.uint8)
            img = img + rng.integers(0, 30, img.shape).astype(np.uint8)
            Image.fromarray(img).save(root / split / "image" / f"{i}.png")
            Image.fromarray(mask * 255).save(
                root / split / "mask" / f"{i}.png")
    return str(root)


def test_regime_split_matches_reference_semantics():
    import math
    import random
    names = [f"img_{i}.png" for i in range(17)]
    # reference algorithm inline (dataset_2d.py:37-52)
    num = math.ceil(len(names) / 100 * 20)
    shuffled = names.copy()
    random.Random(3).shuffle(shuffled)
    ref_sup = sorted(shuffled[:num])
    ref_unsup = sorted(shuffled[num:])
    assert regime_split(names, 20, 3, True) == ref_sup
    assert regime_split(names, 20, 3, False) == ref_unsup
    assert set(ref_sup) | set(ref_unsup) == set(names)
    assert regime_split(names, 100, 3, True) == names


def test_dataset_and_loader(tiny_dataset):
    ds = SegDataset2D(os.path.join(tiny_dataset, "train"), "image",
                      [0.5] * 3, [0.25] * 3, split="train", sup=True,
                      size=(32, 32))
    assert len(ds) == 8
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (32, 32, 3)
    assert item["image"].dtype == np.float32
    assert item["mask"].shape == (32, 32)
    assert set(np.unique(item["mask"])) <= {0, 1}
    loader = Loader(ds, batch_size=3, shuffle=True, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (3, 32, 32, 3)
    assert batches[-1]["image"].shape == (2, 32, 32, 3)
    # different epochs shuffle differently
    b2 = list(loader)
    assert not all(np.array_equal(a["image"], b["image"])
                   for a, b in zip(batches, b2))


def test_train_sup_2d_end_to_end(tiny_dataset, tmp_path):
    from hebbax.cli.train_sup_2d import add_args, build
    from hebbax.cli.common import base_parser_2d

    parser = add_args(base_parser_2d())
    args = parser.parse_args([
        "--path_dataset", tiny_dataset,
        "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--regime", "100",
        "--batch_size", "4",
        "--num_epochs", "3",
        "--validate_iter", "1",
        "--optimizer", "adam",
        "--lr", "1e-3",
        "--num_workers", "2",
    ])
    trainer = build(args)
    # patch the spatial size (tiny 32x32 images for CI speed)
    for ld in trainer.loaders.values():
        ld.dataset.size = (32, 32)
    best = trainer.run()

    run = trainer.paths.run
    assert os.path.exists(os.path.join(run, "config.json"))
    assert os.path.exists(os.path.join(run, "checkpoints", "last.ckpt"))
    assert os.path.exists(os.path.join(run, "train_log.csv"))
    assert os.path.exists(os.path.join(run, "val_log.csv"))
    cfgd = json.load(open(os.path.join(run, "config.json")))
    assert cfgd["network"] == "unet_s2d"  # shipped default: s2d fast path
    assert 0.0 <= best[1] <= 1.0

    import pandas as pd
    log = pd.read_csv(os.path.join(run, "train_log.csv"))
    assert log["loss"].iloc[-1] < log["loss"].iloc[0]
