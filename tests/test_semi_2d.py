"""Semi-supervised 2D trainers: tiny end-to-end runs per algorithm
(SURVEY.md section 4 level 3; reference scripts train_semi_*_2d.py)."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("GlaS")
    rng = np.random.default_rng(2)
    for split, n in (("train", 8), ("val", 3)):
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


def _run(algo, tiny_dataset, tmp_path, extra=()):
    from hebbax.cli.common import base_parser_2d
    from hebbax.cli.train_semi_2d import add_args, build

    args = add_args(base_parser_2d(), algo).parse_args([
        "--path_dataset", tiny_dataset,
        "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--regime", "50", "--batch_size", "2", "--num_epochs", "2",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-3",
        "--num_workers", "2", *extra,
    ])
    trainer = build(args, algo)
    for ld in trainer.loaders.values():
        ld.dataset.size = (32, 32)
    best = trainer.run()
    run = trainer.paths.run
    assert os.path.exists(os.path.join(run, "checkpoints", "last.ckpt"))
    assert os.path.exists(os.path.join(run, "train_log.csv"))
    assert 0.0 <= best[1] <= 1.0
    return trainer


@pytest.mark.slow  # compile-bound; uamt keeps semi-2D e2e fast coverage
def test_em(tiny_dataset, tmp_path):  # (em's unsup term is plain
    tr = _run("em", tiny_dataset, tmp_path)  # entropy, unit-tested)
    assert "semi_sup" in tr.paths.run
    assert "em_unet" in tr.paths.run


@pytest.mark.slow  # compile-bound dupe: em+uamt keep semi fast coverage
def test_urpc(tiny_dataset, tmp_path):
    tr = _run("urpc", tiny_dataset, tmp_path)
    assert "urpc_unet_urpc" in tr.paths.run


@pytest.mark.slow
def test_cct(tiny_dataset, tmp_path):
    _run("cct", tiny_dataset, tmp_path)


def test_uamt_ema_teacher_moves(tiny_dataset, tmp_path):
    import jax
    tr = _run("uamt", tiny_dataset, tmp_path)
    # teacher params must differ from student (EMA of trajectory), and the
    # second-model last snapshot must exist in checkpoints2
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        tr.state.params1, tr.state.params2)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    assert os.path.exists(os.path.join(tr.paths.checkpoints + "2",
                                       "last.ckpt"))


@pytest.mark.slow  # dual-state covered fast by uamt
def test_cps_two_models_trained(tiny_dataset, tmp_path):
    import jax
    tr = _run("cps", tiny_dataset, tmp_path)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        tr.state.params1, tr.state.params2)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
