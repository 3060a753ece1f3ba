"""3D pipeline tests: NRRD IO round-trip, patch queue semantics,
sliding-window aggregation equivalence vs whole-volume forward
(SURVEY.md section 4 level 4), and tiny end-to-end 3D training."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 3D train/slider/postprocess e2e

from hebbax.data.nrrd_io import read_nrrd, write_nrrd
from hebbax.data.volumes3d import PatchQueue, VolumeDataset3D
from hebbax.engine.sliding import grid_locations, slide_window_inference

PATCH = (16, 16, 8)


@pytest.fixture(scope="module")
def tiny_volumes(tmp_path_factory):
    root = tmp_path_factory.mktemp("Atrial")
    rng = np.random.default_rng(3)
    for split, n in (("train", 4), ("val", 2)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        os.makedirs(root / split / "mask_sdf1")
        for i in range(n):
            shape = (24 + 4 * i, 20, 16)
            vol = rng.normal(100, 20, shape).astype(np.float32)
            xx, yy, zz = np.mgrid[: shape[0], : shape[1], : shape[2]]
            mask = (((xx - shape[0] / 2) ** 2 + (yy - 10) ** 2
                     + (zz - 8) ** 2) < 36).astype(np.uint8) * 255
            vol[mask > 0] += 60
            affine = np.diag([0.625, 0.625, 1.25, 1.0])
            write_nrrd(root / split / "image" / f"v{i}.nrrd", vol,
                       affine=affine)
            write_nrrd(root / split / "mask" / f"v{i}.nrrd", mask,
                       affine=affine)
            from hebbax.ops.distance import mask_to_sdf
            sdf = mask_to_sdf(mask > 0).astype(np.float32)
            write_nrrd(root / split / "mask_sdf1" / f"v{i}.nrrd", sdf,
                       affine=affine)
    return str(root)


def test_nrrd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in (np.uint8, np.float32, np.int16):
        arr = (rng.random((7, 9, 5)) * 100).astype(dtype)
        affine = np.array([[0.5, 0, 0, -10], [0, 0.7, 0, 3],
                           [0, 0, 1.5, 2], [0, 0, 0, 1]])
        p = tmp_path / f"x_{dtype.__name__}.nrrd"
        write_nrrd(p, arr, affine=affine)
        back, hdr = read_nrrd(p)
        np.testing.assert_array_equal(back, arr)
        np.testing.assert_allclose(hdr["affine"], affine)
    # raw encoding too
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    p = tmp_path / "raw.nrrd"
    write_nrrd(p, arr, encoding="raw")
    back, _ = read_nrrd(p)
    np.testing.assert_array_equal(back, arr)


def test_volume_dataset(tiny_volumes):
    ds = VolumeDataset3D(os.path.join(tiny_volumes, "train"),
                         split="train", sup=True, sdf=True)
    assert len(ds) == 4
    item = ds.get_volume(0, np.random.default_rng(0))
    assert item["image"].dtype == np.float32
    assert set(np.unique(item["mask"])) <= {0, 1}  # 255 -> 1 relabel
    assert "mask_sdf" in item
    assert item["mask_sdf"].shape == item["image"].shape
    # znormalized over above-mean voxels
    v = item["image"]
    m = v > 0  # post-norm mask differs; just sanity-check stats are sane
    assert abs(float(v.mean())) < 1.5


def test_patch_queue(tiny_volumes):
    ds = VolumeDataset3D(os.path.join(tiny_volumes, "train"),
                         split="train", sup=True)
    q = PatchQueue(ds, PATCH, batch_size=2, samples_per_volume=3,
                   max_length=6, seed=0)
    batches = list(q)
    total = sum(b["image"].shape[0] for b in batches)
    assert total == 4 * 3
    assert len(q) == (4 * 3 + 1) // 2
    for b in batches:
        assert b["image"].shape[1:] == PATCH
        assert b["mask"].shape[1:] == PATCH
    # different epoch -> different patches
    b2 = list(q)
    assert not np.array_equal(batches[0]["image"], b2[0]["image"])


def test_regime_split_3d_keeps_shuffled_order(tiny_volumes):
    import random
    ds_sup = VolumeDataset3D(os.path.join(tiny_volumes, "train"),
                             split="train", sup=True, regime=50, seed=1)
    ds_unsup = VolumeDataset3D(os.path.join(tiny_volumes, "train"),
                               split="train", sup=False, regime=50, seed=1)
    names = sorted(os.listdir(os.path.join(tiny_volumes, "train", "image")))
    assert len(ds_sup) == 2 and len(ds_unsup) == 2
    assert set(ds_sup.names) | set(ds_unsup.names) == set(names)
    assert not (set(ds_sup.names) & set(ds_unsup.names))


def test_grid_locations_cover_volume():
    locs = grid_locations((30, 20, 12), PATCH, (8, 8, 4))
    covered = np.zeros((30, 20, 12), bool)
    for x, y, z in locs:
        covered[x:x + 16, y:y + 16, z:z + 8] = True
        assert x + 16 <= 30 and y + 16 <= 20 and z + 8 <= 12
    assert covered.all()


def test_sliding_window_equals_whole_volume_forward():
    """A linear 'model' must aggregate to exactly the whole-volume result."""
    w = np.random.default_rng(0).normal(size=(1, 2)).astype(np.float32)

    def forward(patches):  # (B, x, y, z, 1) -> (B, x, y, z, 2)
        return patches @ w

    vol = np.random.default_rng(1).normal(
        size=(24, 20, 12)).astype(np.float32)
    agg = slide_window_inference(forward, vol, PATCH, (8, 8, 4), 2,
                                 batch_size=3)
    expected = vol[..., None] @ w
    np.testing.assert_allclose(agg, expected, rtol=1e-5, atol=1e-5)


def test_train_sup_3d_end_to_end(tiny_volumes, tmp_path):
    from hebbax.cli.common3d import base_parser_3d
    from hebbax.cli.train_sup_3d import add_args, build

    args = add_args(base_parser_3d()).parse_args([
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--path_root_exp", str(tmp_path / "runs"),
        "--network", "unet3d_min", "--regime", "100",
        "--batch_size", "2", "--num_epochs", "2", "--validate_iter", "1",
        "--optimizer", "adam", "--lr", "1e-3",
        "--patch_size", "(16,16,16)",
        "--samples_per_volume_train", "2", "--samples_per_volume_val", "2",
    ])
    trainer = build(args)
    best = trainer.run()
    assert os.path.exists(os.path.join(trainer.paths.checkpoints,
                                       "last.ckpt"))
    assert 0.0 <= best[1] <= 1.0


def test_semi_dtc_3d_end_to_end(tiny_volumes, tmp_path):
    from hebbax.cli.common3d import base_parser_3d
    from hebbax.cli.train_semi_3d import add_args, build

    args = add_args(base_parser_3d(), "dtc").parse_args([
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--path_root_exp", str(tmp_path / "runs"),
        "--regime", "50", "--batch_size", "2", "--num_epochs", "1",
        "--validate_iter", "1", "--optimizer", "adam", "--lr", "1e-3",
        "--patch_size", "(16,16,16)", "--network", "unet3d_dtc",
        "--samples_per_volume_train", "2", "--samples_per_volume_val", "2",
    ])
    trainer = build(args, "dtc")
    best = trainer.run()
    assert 0.0 <= best[1] <= 1.0


def test_test_3d_cli(tiny_volumes, tmp_path):
    from hebbax.cli.common3d import base_parser_3d
    from hebbax.cli.train_sup_3d import add_args, build
    from hebbax.cli.test_3d import build_parser, run_test

    args = add_args(base_parser_3d()).parse_args([
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--path_root_exp", str(tmp_path / "runs"),
        "--network", "unet3d_min", "--regime", "100",
        "--batch_size", "2", "--num_epochs", "1", "--validate_iter", "1",
        "--optimizer", "adam", "--lr", "1e-3",
        "--patch_size", "(16,16,16)",
        "--samples_per_volume_train", "2", "--samples_per_volume_val", "2",
    ])
    trainer = build(args)
    trainer.run()
    targs = build_parser().parse_args([
        "--path_exp", trainer.paths.run,
        "--path_dataset", tiny_volumes, "--dataset_name", "Atrial",
        "--network", "unet3d_min",
        "--patch_size", "(16,16,16)", "--patch_overlap", "(8,8,8)",
        "--batch_size", "2", "--postprocessing", "1",
    ])
    results = run_test(targs)
    assert os.path.exists(os.path.join(trainer.paths.run, "test.csv"))
    assert 0.0 <= results["dice"] <= 1.0


def test_device_slider_sharded_and_finalized():
    """VERDICT r1 item 4: the mesh-sharded device slider (sharded patch
    forward + device-resident scatter-add in ONE jitted program) must be
    byte-identical to the dp=1 device slider; on-device finalize must
    match host softmax/threshold/argmax."""
    import jax
    import jax.numpy as jnp

    from hebbax.engine.sliding import slide_window_inference_device
    from hebbax.parallel import make_mesh

    w = np.random.default_rng(0).normal(size=(1, 2)).astype(np.float32)

    def forward(patches):
        return patches @ w

    vol = np.random.default_rng(1).normal(
        size=(24, 20, 12)).astype(np.float32)
    kw = dict(patch_size=PATCH, overlap=(8, 8, 4), n_cls=2, batch_size=8)
    logits1 = slide_window_inference_device(forward, vol, **kw)
    mesh = make_mesh(8)
    logits8 = slide_window_inference_device(forward, vol, mesh=mesh, **kw)
    np.testing.assert_allclose(logits1, logits8, rtol=1e-6, atol=1e-6)

    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits1), axis=-1))[..., 1]
    want_bin = (probs > 0.43).astype(np.uint8)
    for m in (None, mesh):
        got_bin = slide_window_inference_device(
            forward, vol, mesh=m, finalize="binary", threshold=0.43, **kw)
        assert got_bin.dtype == np.uint8
        np.testing.assert_array_equal(got_bin, want_bin)
    got_arg = slide_window_inference_device(
        forward, vol, finalize="argmax", **kw)
    np.testing.assert_array_equal(got_arg,
                                  np.argmax(logits1, -1).astype(np.uint8))

    # deferred-fetch contract: device array + crop closure
    dev, crop = slide_window_inference_device(
        forward, vol, finalize="binary", threshold=0.43, fetch=False, **kw)
    np.testing.assert_array_equal(crop(dev), want_bin)
