"""EM/URPC/CCT 3D single-state trainers end to end on tiny volumes, and
the jax.profiler trace flag."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 3D single-model semi e2e

from hebbax.data.nrrd_io import write_nrrd


@pytest.fixture(scope="module")
def tiny_volumes(tmp_path_factory):
    root = tmp_path_factory.mktemp("Atrial")
    rng = np.random.default_rng(8)
    for split, n in (("train", 4), ("val", 2)):
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


@pytest.mark.parametrize("algo,net", [("em", "unet3d_min"),
                                      ("urpc", "unet3d_urpc"),
                                      ("cct", "unet3d_cct_min")])
def test_single_semi_3d(algo, net, tiny_volumes, tmp_path):
    from hebbax.cli.common3d import base_parser_3d
    from hebbax.cli.train_semi_3d import add_args, build

    args = add_args(base_parser_3d(), algo).parse_args([
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--path_root_exp", str(tmp_path / "runs"), "--network", net,
        "--regime", "50", "--batch_size", "2", "--num_epochs", "1",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-3",
        "--patch_size", "(16,16,16)",
        "--samples_per_volume_train", "2", "--samples_per_volume_val", "2",
    ])
    trainer = build(args, algo)
    best = trainer.run()
    assert 0.0 <= best[1] <= 1.0
    assert os.path.exists(os.path.join(trainer.paths.checkpoints,
                                       "last.ckpt"))


def test_profile_dir_flag(tiny_volumes, tmp_path):
    from hebbax.cli.common3d import base_parser_3d
    from hebbax.cli.train_sup_3d import add_args, build

    trace_dir = str(tmp_path / "trace")
    args = add_args(base_parser_3d()).parse_args([
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--path_root_exp", str(tmp_path / "runs"),
        "--network", "unet3d_min", "--regime", "100",
        "--batch_size", "2", "--num_epochs", "2", "--validate_iter", "2",
        "--optimizer", "adam", "--lr", "1e-3",
        "--patch_size", "(16,16,16)",
        "--samples_per_volume_train", "2", "--samples_per_volume_val", "2",
        "--profile_dir", trace_dir,
    ])
    trainer = build(args)
    trainer.run()
    # epoch 1 was traced
    assert os.path.isdir(trace_dir)
    assert any(os.scandir(trace_dir))
