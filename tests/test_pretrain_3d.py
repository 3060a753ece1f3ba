"""3D unsupervised pretrainers (VAE / superpixel) on tiny volumes."""

import os

import numpy as np
import pytest

from hebbax.data.nrrd_io import write_nrrd


@pytest.fixture(scope="module")
def tiny_volumes(tmp_path_factory):
    root = tmp_path_factory.mktemp("Atrial")
    rng = np.random.default_rng(5)
    for split, n in (("train", 3), ("val", 2)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(n):
            shape = (20, 20, 16)
            vol = rng.normal(100, 20, shape).astype(np.float32)
            xx, yy, zz = np.mgrid[:20, :20, :16]
            mask = (((xx - 10) ** 2 + (yy - 10) ** 2 + (zz - 6) ** 2)
                    < 25).astype(np.uint8) * 255
            vol[mask > 0] += 60
            write_nrrd(root / split / "image" / f"v{i}.nrrd", vol)
            write_nrrd(root / split / "mask" / f"v{i}.nrrd", mask)
    return str(root)


@pytest.mark.parametrize("kind,net", [
    # 3D e2e CLI runs are the slow tier (r4 tiering); the 2D pretrain
    # CLIs cover the same code paths fast (test_pretrain_2d.py)
    pytest.param("vae", "unet3d_vae", marks=pytest.mark.slow),
    pytest.param("superpix", "unet3d_superpix", marks=pytest.mark.slow),
    # central-z-slice 2D diffusion (pretrain_superdiff_unsup_3d.py:188)
    pytest.param("superdiff", "unet_ddpm", marks=pytest.mark.slow),
])
def test_pretrain_3d(kind, net, tiny_volumes, tmp_path):
    from hebbax.cli.common3d import base_parser_3d
    from hebbax.cli.pretrain_unsup_3d import add_args, build

    extra = ["--timestamp_diffusion", "8"] if kind == "superdiff" else []
    args = add_args(base_parser_3d(), kind).parse_args([
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--path_root_exp", str(tmp_path / "runs"),
        "--network", net, "--batch_size", "2", "--num_epochs", "1",
        "--validate_iter", "1", "--lr", "1e-4",
        "--patch_size", "(16,16,16)",
        "--samples_per_volume_train", "2", "--samples_per_volume_val", "2",
        *extra,
    ])
    trainer = build(args, kind)
    # shrink the 3D models for CI (init_features=64 default is heavy)
    best = trainer.run()
    assert os.path.exists(os.path.join(trainer.paths.checkpoints,
                                       "last.ckpt"))
    assert 0.0 <= best[1] <= 1.0
