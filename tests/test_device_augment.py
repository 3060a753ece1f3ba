"""On-device augmentation: distribution parity with the host pipeline,
and an end-to-end --device_augment run."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from hebbax.ops.augment_device import augment_batch


def test_device_augment_produces_d4_symmetries():
    """Every output must be one of the 8 dihedral transforms of the
    input, image and mask transformed identically."""
    rng = np.random.default_rng(0)
    img = rng.random((1, 16, 16, 3)).astype(np.float32)
    mask = rng.integers(0, 2, (1, 16, 16)).astype(np.int32)

    def d4_variants(a):
        outs = []
        for t in (a, np.swapaxes(a, 0, 1)):
            for k in range(4):
                outs.append(np.rot90(t, k, axes=(0, 1)))
        return outs

    img_vars = [np.asarray(v) for v in d4_variants(img[0])]
    mask_vars = [np.asarray(v) for v in d4_variants(mask[0])]
    hits = set()
    for i in range(64):
        gi, gm = augment_batch(jax.random.PRNGKey(i),
                               jnp.asarray(img), jnp.asarray(mask))
        gi, gm = np.asarray(gi[0]), np.asarray(gm[0])
        matched = None
        for vi, (iv, mv) in enumerate(zip(img_vars, mask_vars)):
            if np.array_equal(gi, iv):
                assert np.array_equal(gm, mv), "image/mask desynced"
                matched = vi
                break
        assert matched is not None, "output not a D4 symmetry"
        hits.add(matched)
    assert len(hits) >= 6  # sampling covers most of the group


@pytest.mark.slow  # CLI wiring dupe of test_train_sup_2d e2e; the
def test_device_augment_training(tmp_path):  # augment op itself is
    # covered fast by the D4-distribution test above
    root = tmp_path / "GlaS"
    rng = np.random.default_rng(1)
    for split, n in (("train", 6), ("val", 3)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(n):
            yy, xx = np.mgrid[:32, :32]
            m = ((yy - 16) ** 2 + (xx - 16) ** 2 < 64).astype(np.uint8)
            Image.fromarray(np.stack([m * 150 + 50] * 3, -1).astype(
                np.uint8)).save(root / split / "image" / f"{i}.png")
            Image.fromarray(m * 255).save(root / split / "mask" / f"{i}.png")

    from hebbax.cli.common import base_parser_2d
    from hebbax.cli.train_sup_2d import add_args, build
    args = add_args(base_parser_2d()).parse_args([
        "--path_dataset", str(root), "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"), "--regime", "100",
        "--batch_size", "3", "--num_epochs", "2", "--validate_iter", "1",
        "--optimizer", "adam", "--lr", "1e-3", "--num_workers", "2",
        "--device_augment", "1",
    ])
    trainer = build(args)
    for ld in trainer.loaders.values():
        ld.dataset.size = (32, 32)
    assert trainer.loaders["train"].dataset.host_augment is False
    best = trainer.run()
    assert 0.0 <= best[1] <= 1.0
