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


def test_vit_non_default_patch_grid():
    """The trainer derives the grid from encoder.patch; the token
    reshape must agree for ANY patch size, not just the ViT-B/14
    default (regression test for a hard-coded patch_size=14)."""
    from hebbax.models.raddino import ViTEncoder, reshape_patch_embeddings
    enc = ViTEncoder(depth=1, dim=96, patch=16)  # dim % 12 heads == 0
    size = 112
    tokens = jax.eval_shape(
        lambda x: enc.apply(
            enc.init({"params": jax.random.PRNGKey(0)}, x), x),
        jnp.zeros((2, size, size, 3)))
    g = size // enc.patch
    assert tokens.shape == (2, 1 + g * g, 96)
    grid = jax.eval_shape(
        lambda t: reshape_patch_embeddings(t, size, enc.patch), tokens)
    assert grid.shape == (2, g, g, 96)


def test_hf_key_mapping_forward_parity():
    """apply_hf_state_dict vs a randomly-initialized HF Dinov2Model
    (the rad-dino architecture): mapped flax forward must reproduce the
    torch last_hidden_state.  Uses gelu_pytorch_tanh so both sides share
    the tanh GELU; at init dinov2's LayerScale is exactly identity, so the
    (unmapped) lambda parameters don't perturb parity."""
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "Dinov2Model"):
        pytest.skip("transformers lacks Dinov2Model")
    import torch

    from hebbax.models.raddino import ViTEncoder, apply_hf_state_dict

    # 2 layers instead of 12: the keymap loop is index-generic, so this
    # still proves embeddings + per-block mapping + final LN while
    # keeping the CPU fast tier fast (full depth only changes runtime)
    cfg = transformers.Dinov2Config(image_size=224, patch_size=14,
                                    num_hidden_layers=2,
                                    hidden_act="gelu_pytorch_tanh")
    torch.manual_seed(0)
    hf = transformers.Dinov2Model(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    enc = ViTEncoder(depth=2)
    v = enc.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, 224, 224, 3)))
    mapped = apply_hf_state_dict(v["params"], sd)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))
                  ).last_hidden_state.numpy()
    got = np.asarray(enc.apply({"params": mapped}, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 257, 768)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_hf_key_mapping_shape_guard():
    """A state dict with a wrong-shaped tensor must be rejected (the
    mapping asserts destination shapes)."""
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "Dinov2Model"):
        pytest.skip("transformers lacks Dinov2Model")
    import torch

    from hebbax.models.raddino import ViTEncoder, apply_hf_state_dict

    cfg = transformers.Dinov2Config(image_size=224, patch_size=14,
                                    num_hidden_layers=2)
    torch.manual_seed(0)
    sd = {k: v.detach().numpy()
          for k, v in transformers.Dinov2Model(cfg).state_dict().items()}
    sd["embeddings.cls_token"] = np.zeros((1, 2, 768), np.float32)
    enc = ViTEncoder(depth=2)
    v = enc.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, 224, 224, 3)))
    with pytest.raises(AssertionError):
        apply_hf_state_dict(v["params"], sd)


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


@pytest.mark.slow  # ~100 s of CPU compiles even shrunk; the raddino
def test_raddino_trainer_end_to_end(tiny_dataset, tmp_path, monkeypatch):
    # subsystem keeps fast coverage via the keymap/decoder/token tests
    import hebbax.cli.train_semi_raddino_decoder_2d as mod
    from hebbax.models.raddino import ViTEncoder

    # full-size compile is the slow tier's job: shrink the frozen encoder
    # (1 block, 96-dim) and run the whole protocol at 112^2 (grid 8)
    monkeypatch.setattr(mod, "ViTEncoder",
                        functools.partial(ViTEncoder, depth=1, dim=96))
    from hebbax.cli.common import base_parser_2d
    args = mod.add_args(base_parser_2d()).parse_args([
        "--path_dataset", tiny_dataset, "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--regime", "50", "--batch_size", "2", "--num_epochs", "1",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-4",
        "--num_workers", "2",
    ])
    trainer = mod.build(args, image_size=112)
    best = trainer.run()
    assert os.path.exists(os.path.join(trainer.paths.checkpoints,
                                       "last.ckpt"))
    assert 0.0 <= best[1] <= 1.0
