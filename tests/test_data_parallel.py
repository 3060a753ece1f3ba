"""SPMD data parallelism on the virtual 8-device CPU mesh: the sharded
trainer must run end to end and match the single-device loss trajectory
(same data, same seeds; batch stats differ only by floating-point
reduction order)."""

import os

import jax
import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("GlaS")
    rng = np.random.default_rng(4)
    for split, n in (("train", 16), ("val", 8)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(n):
            yy, xx = np.mgrid[:32, :32]
            cy, cx = rng.integers(10, 22, 2)
            mask = ((yy - cy) ** 2 + (xx - cx) ** 2 < 49).astype(np.uint8)
            img = np.stack([mask * 150 + 50] * 3, -1).astype(np.uint8)
            Image.fromarray(img).save(root / split / "image" / f"{i}.png")
            Image.fromarray(mask * 255).save(
                root / split / "mask" / f"{i}.png")
    return str(root)


def _build(tiny_dataset, tmp_path, dp, tag):
    from hebbax.cli.common import base_parser_2d
    from hebbax.cli.train_sup_2d import add_args, build

    args = add_args(base_parser_2d()).parse_args([
        "--path_dataset", tiny_dataset, "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / tag),
        "--regime", "100", "--batch_size", "8", "--num_epochs", "2",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-3",
        "--num_workers", "2", "--dp_devices", str(dp),
    ])
    trainer = build(args)
    for ld in trainer.loaders.values():
        ld.dataset.size = (32, 32)
    return trainer


def test_dp_trainer_runs_and_matches_single_device(tiny_dataset, tmp_path):
    assert len(jax.devices()) == 8
    t1 = _build(tiny_dataset, tmp_path, 1, "single")
    best1 = t1.run()
    t8 = _build(tiny_dataset, tmp_path, 8, "dp8")
    best8 = t8.run()
    import pandas as pd
    l1 = pd.read_csv(os.path.join(t1.paths.run, "train_log.csv"))
    l8 = pd.read_csv(os.path.join(t8.paths.run, "train_log.csv"))
    # identical data order + params: losses match to float tolerance
    np.testing.assert_allclose(l1["loss"], l8["loss"], rtol=2e-3)
    assert abs(best1[1] - best8[1]) < 5e-2
