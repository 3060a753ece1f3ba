"""Hebbian pretrain -> fine-tune hand-off, end to end on tiny data
(SURVEY.md section 3.2 call stack; reference reproduce_hebbian_* flow)."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("GlaS")
    rng = np.random.default_rng(1)
    for split, n in (("train", 6), ("val", 4)):
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


@pytest.mark.slow  # CLI mode wiring only: the rule math for every mode
@pytest.mark.parametrize("mode", ["hpca", "contrastive"])
def test_hebbian_pretrain_other_modes(mode, tiny_dataset, tmp_path):
    # is covered fast by test_hebb_torch_parity; swta_t runs e2e fast in
    # test_hebbian_pretrain_then_finetune
    """The non-default rules also run through the full CLI pipeline."""
    from hebbax.cli.common import base_parser_2d
    from hebbax.cli import pretrain_hebbian_unsup_2d as pre

    args = pre.add_args(base_parser_2d()).parse_args([
        "--path_dataset", tiny_dataset, "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--batch_size", "3", "--num_epochs", "1", "--validate_iter", "1",
        "--lr", "1e-5", "--num_workers", "2",
        "--exclude", "out_conv", "--hebb_mode", mode,
    ])
    trainer = pre.build(args)
    for ld in trainer.loaders.values():
        ld.dataset.size = (32, 32)
    best = trainer.run()
    assert 0.0 <= best[1] <= 1.0


def test_hebbian_pretrain_then_finetune(tiny_dataset, tmp_path):
    from hebbax.cli.common import base_parser_2d
    from hebbax.cli import pretrain_hebbian_unsup_2d as pre
    from hebbax.cli import train_sup_2d as sup
    from hebbax.utils.checkpoint import load_snapshot

    # --- pretrain (swta_t, alpha=1, head excluded) ---
    args = pre.add_args(base_parser_2d()).parse_args([
        "--path_dataset", tiny_dataset,
        "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs"),
        "--batch_size", "3", "--num_epochs", "2", "--validate_iter", "1",
        "--lr", "1e-4", "--num_workers", "2",
        "--exclude", "out_conv", "--hebb_mode", "swta_t",
        "--hebb_inv_temp", "20",
    ])
    trainer = pre.build(args)
    for ld in trainer.loaders.values():
        ld.dataset.size = (32, 32)

    import flax.traverse_util as tu
    params_before = tu.flatten_dict(
        pre.jax.tree_util.tree_map(np.asarray, trainer.state.params))
    trainer.run()
    params_after = tu.flatten_dict(
        pre.jax.tree_util.tree_map(np.asarray, trainer.state.params))

    # Hebbian kernels moved; frozen BN scale did not; head moved (backprop)
    enc_kernel = ("encoder", "in_conv", "conv1", "kernel")
    assert not np.allclose(params_before[enc_kernel],
                           params_after[enc_kernel])
    bn_scale = ("encoder", "in_conv", "bn1", "scale")
    np.testing.assert_array_equal(params_before[bn_scale],
                                  params_after[bn_scale])
    head_kernel = ("out_conv", "conv1", "kernel")
    assert not np.allclose(params_before[head_kernel],
                           params_after[head_kernel])
    # converted conv biases frozen at zero
    enc_bias = ("encoder", "in_conv", "conv1", "bias")
    np.testing.assert_array_equal(params_after[enc_bias], 0.0)

    ckpt = os.path.join(trainer.paths.checkpoints, "last.ckpt")
    assert os.path.exists(ckpt)
    _, meta = load_snapshot(ckpt)
    assert meta["hebb_params"]["mode"] == "swta_t"
    assert meta["hebb_params"]["alpha"] == 1.0
    assert meta["excluded_layers"] == ["out_conv"]

    # --- fine-tune from the snapshot (alpha forced to 0, head re-init) ---
    sargs = sup.add_args(base_parser_2d()).parse_args([
        "--path_dataset", tiny_dataset,
        "--dataset_name", "GlaS",
        "--path_root_exp", str(tmp_path / "runs2"),
        "--regime", "50", "--batch_size", "3", "--num_epochs", "2",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-3",
        "--num_workers", "2",
        "--load_hebbian_weights", ckpt,
    ])
    st = sup.build(sargs)
    for ld in st.loaders.values():
        ld.dataset.size = (32, 32)
    ft_params = tu.flatten_dict(
        pre.jax.tree_util.tree_map(np.asarray, st.state.params))
    # encoder kernels carried over from pretraining
    np.testing.assert_array_equal(ft_params[enc_kernel],
                                  params_after[enc_kernel])
    # head re-initialized (kaiming), not the pretrained probe
    assert not np.allclose(ft_params[head_kernel],
                           params_after[head_kernel])
    best = st.run()
    assert 0.0 <= best[1] <= 1.0
    # fine-tuning updated encoder kernels (everything unfrozen)
    ft_after = tu.flatten_dict(
        pre.jax.tree_util.tree_map(np.asarray, st.state.params))
    assert not np.allclose(ft_after[enc_kernel], ft_params[enc_kernel])
