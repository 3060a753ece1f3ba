"""UAMT/CPS 3D builder paths (DualState + patch queues), one epoch on
tiny volumes with the small 3D model."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 3D dual-model semi e2e (CCT/DTC)

from hebbax.data.nrrd_io import write_nrrd


@pytest.fixture(scope="module")
def tiny_volumes(tmp_path_factory):
    root = tmp_path_factory.mktemp("Atrial")
    rng = np.random.default_rng(7)
    for split, n in (("train", 4), ("val", 2)):
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


@pytest.mark.parametrize("algo", ["uamt", "cps"])
def test_dual_semi_3d(algo, tiny_volumes, tmp_path):
    from hebbax.cli.common3d import base_parser_3d
    from hebbax.cli.train_semi_3d import add_args, build

    args = add_args(base_parser_3d(), algo).parse_args([
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--path_root_exp", str(tmp_path / "runs"),
        "--network", "unet3d_min",
        # 2 epochs: at epoch 0 the UAMT EMA alpha is 0 (teacher copies
        # student exactly, utils.py:559), so divergence shows at epoch 1
        "--regime", "50", "--batch_size", "2", "--num_epochs", "2",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-3",
        "--patch_size", "(16,16,16)",
        "--samples_per_volume_train", "2", "--samples_per_volume_val", "2",
    ])
    trainer = build(args, algo)
    best = trainer.run()
    assert 0.0 <= best[1] <= 1.0
    assert os.path.exists(os.path.join(trainer.paths.checkpoints,
                                       "last.ckpt"))
    # both models in the dual state differ
    import jax
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        trainer.state.params1, trainer.state.params2)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
