"""3D Hebbian pretraining through the CLI: exercises swta_t on real
ConvTranspose3d sites (the 2D zoo has none) plus the 3D conv rule in a
full model, and the pretrain -> fine-tune hand-off in 3D."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 3D hebbian pretrain e2e

from hebbax.data.nrrd_io import write_nrrd


@pytest.fixture(scope="module")
def tiny_volumes(tmp_path_factory):
    root = tmp_path_factory.mktemp("Atrial")
    rng = np.random.default_rng(9)
    for split, n in (("train", 3), ("val", 2)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(n):
            shape = (16, 16, 16)
            vol = rng.normal(100, 20, shape).astype(np.float32)
            xx, yy, zz = np.mgrid[:16, :16, :16]
            mask = (((xx - 8) ** 2 + (yy - 8) ** 2 + (zz - 8) ** 2)
                    < 16).astype(np.uint8) * 255
            vol[mask > 0] += 60
            write_nrrd(root / split / "image" / f"v{i}.nrrd", vol)
            write_nrrd(root / split / "mask" / f"v{i}.nrrd", mask)
    return str(root)


def test_hebbian_pretrain_3d_then_finetune(tiny_volumes, tmp_path):
    import flax.traverse_util as tu
    import jax

    from hebbax.cli.common3d import base_parser_3d
    from hebbax.cli import pretrain_hebbian_unsup_3d as pre
    from hebbax.cli import train_sup_3d as sup
    from hebbax.utils.checkpoint import load_snapshot

    args = pre.add_args(base_parser_3d()).parse_args([
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--path_root_exp", str(tmp_path / "runs"),
        "--network", "unet3d_min",
        # 2 epochs: epoch 0 trains at lr 0 (GradualWarmupScheduler parity
        # artifact, hebbax/config/schedules.py)
        "--batch_size", "2", "--num_epochs", "2", "--validate_iter", "1",
        "--lr", "1e-5", "--patch_size", "(16,16,16)",
        "--samples_per_volume_train", "2", "--samples_per_volume_val", "2",
        "--exclude", "conv", "--hebb_mode", "swta_t",
        "--hebb_inv_temp", "20",
    ])
    trainer = pre.build(args)
    p0 = tu.flatten_dict(jax.tree_util.tree_map(
        np.asarray, trainer.state.params))
    trainer.run()
    p1 = tu.flatten_dict(jax.tree_util.tree_map(
        np.asarray, trainer.state.params))
    # hebbian transpose-conv kernels moved (swta_t on upconv sites)
    up_kernel = ("decoder", "upconv1", "kernel")
    enc_kernel = ("encoder", "encoder1", "conv1", "kernel")
    # exact comparison: adam lr=1e-5 steps are inside allclose's rtol
    assert not np.array_equal(p0[up_kernel], p1[up_kernel])
    assert not np.array_equal(p0[enc_kernel], p1[enc_kernel])
    # excluded head trained by backprop
    assert not np.array_equal(p0[("conv", "kernel")],
                              p1[("conv", "kernel")])

    ckpt = os.path.join(trainer.paths.checkpoints, "last.ckpt")
    _, meta = load_snapshot(ckpt)
    assert meta["excluded_layers"] == ["conv"]

    sargs = sup.add_args(base_parser_3d()).parse_args([
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--path_root_exp", str(tmp_path / "runs2"),
        "--network", "unet3d_min",
        "--regime", "50", "--batch_size", "2", "--num_epochs", "1",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-3",
        "--patch_size", "(16,16,16)",
        "--samples_per_volume_train", "2", "--samples_per_volume_val", "2",
        "--load_hebbian_weights", ckpt,
    ])
    st = sup.build(sargs)
    ft = tu.flatten_dict(jax.tree_util.tree_map(np.asarray,
                                                st.state.params))
    np.testing.assert_array_equal(ft[enc_kernel], p1[enc_kernel])
    # head re-initialized
    assert not np.array_equal(ft[("conv", "kernel")],
                              p1[("conv", "kernel")])
    best = st.run()
    assert 0.0 <= best[1] <= 1.0
