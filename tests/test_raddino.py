"""RAD-DINO decoder: shapes, and a tiny end-to-end EM run with a shallow
encoder (full 12-block ViT compile is too slow for CPU CI)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image


def test_decoder_output_shape():
    from hebbax.models.raddino import RadDinoDecoder
    dec = RadDinoDecoder(2)
    v = dec.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, 16, 16, 768)), train=False)
    out = dec.apply(v, jnp.zeros((2, 16, 16, 768)), train=False)
    assert out.shape == (2, 224, 224, 2)


def test_vit_tokens_shape():
    from hebbax.models.raddino import ViTEncoder, reshape_patch_embeddings
    enc = ViTEncoder(depth=1)
    v = enc.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, 224, 224, 3)))
    tokens = enc.apply(v, jnp.zeros((2, 224, 224, 3)))
    assert tokens.shape == (2, 1 + 16 * 16, 768)
    grid = reshape_patch_embeddings(tokens)
    assert grid.shape == (2, 16, 16, 768)


@pytest.fixture()
def tiny_dataset(tmp_path):
    root = tmp_path / "GlaS"
    for split, n in (("train", 4), ("val", 2)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(n):
            yy, xx = np.mgrid[:64, :64]
            m = ((yy - 32) ** 2 + (xx - 32) ** 2 < 225).astype(np.uint8)
            img = np.stack([m * 180 + 40] * 3, -1).astype(np.uint8)
            Image.fromarray(img).save(root / split / "image" / f"{i}.png")
            Image.fromarray(m * 255).save(root / split / "mask" / f"{i}.png")
    return str(root)


def test_raddino_trainer_end_to_end(tiny_dataset, tmp_path, monkeypatch):
    import hebbax.cli.train_semi_raddino_decoder_2d as mod
    from hebbax.models.raddino import ViTEncoder

    monkeypatch.setattr(mod, "ViTEncoder",
                        functools.partial(ViTEncoder, depth=1))
    from hebbax.cli.common import base_parser_2d
    args = mod.add_args(base_parser_2d()).parse_args([
        "--path_dataset", tiny_dataset, "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--regime", "50", "--batch_size", "2", "--num_epochs", "1",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-4",
        "--num_workers", "2",
    ])
    trainer = mod.build(args)
    best = trainer.run()
    assert os.path.exists(os.path.join(trainer.paths.checkpoints,
                                       "last.ckpt"))
    assert 0.0 <= best[1] <= 1.0
