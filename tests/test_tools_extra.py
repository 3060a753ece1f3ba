"""Additional tool coverage: wavelet3D, mask2sdf CLI, eval CLI,
residuals, report aggregation, weight visualization."""

import importlib.util
import os

import numpy as np
import pytest

from hebbax.data.nrrd_io import read_nrrd, write_nrrd


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, f"/root/repo/tools/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def volume_dir(tmp_path):
    src = tmp_path / "image"
    os.makedirs(src)
    rng = np.random.default_rng(0)
    vol = rng.normal(100, 15, (16, 16, 8)).astype(np.float32)
    write_nrrd(src / "v0.nrrd", vol)
    return str(src), vol


def test_wavelet3d_tool(volume_dir, tmp_path):
    src, vol = volume_dir
    w3d = _load_tool("wavelet3D")
    w3d.main(["--image_path", src, "--L_path", str(tmp_path / "L"),
              "--H_path", str(tmp_path / "H"), "--wavelet_type", "haar"])
    low, _ = read_nrrd(tmp_path / "L" / "v0.nrrd")
    high, _ = read_nrrd(tmp_path / "H" / "v0.nrrd")
    assert low.shape == vol.shape and high.shape == vol.shape


def test_mask2sdf_tool(tmp_path):
    src = tmp_path / "mask"
    os.makedirs(src)
    xx, yy, zz = np.mgrid[:16, :16, :8]
    mask = ((xx - 8) ** 2 + (yy - 8) ** 2 + (zz - 4) ** 2 < 16).astype(
        np.uint8) * 255
    write_nrrd(src / "m.nrrd", mask)
    tool = _load_tool("mask2sdf")
    tool.main(["--mask_path", str(src)])
    sdf, _ = read_nrrd(tmp_path / "mask_sdf1" / "m.nrrd")
    assert sdf.min() >= -1 and sdf.max() <= 1
    assert sdf[8, 8, 4] < 0


def test_eval_tool_3d(tmp_path):
    pred_d, mask_d = tmp_path / "pred", tmp_path / "mask"
    os.makedirs(pred_d)
    os.makedirs(mask_d)
    xx, yy, zz = np.mgrid[:16, :16, :8]
    mask = (((xx - 8) ** 2 + (yy - 8) ** 2 + (zz - 4) ** 2) < 16).astype(
        np.uint8)
    pred = np.roll(mask, 1, axis=0)
    write_nrrd(pred_d / "a.nrrd", pred)
    write_nrrd(mask_d / "a.nrrd", mask * 255)
    tool = _load_tool("eval")
    out = tool.main(["--pred_path", str(pred_d), "--mask_path",
                     str(mask_d), "--if_3D", "1"])
    assert 0.3 < out["dice"] <= 1.0
    assert out["95hd"] >= 0


def test_residual_tool(volume_dir, tmp_path):
    src, vol = volume_dir
    tool = _load_tool("res_image_mask")
    tool.main(["--image_path", src, "--out_path", str(tmp_path / "res")])
    res, _ = read_nrrd(tmp_path / "res" / "v0.nrrd")
    np.testing.assert_allclose(res[..., 0], 0)
    np.testing.assert_allclose(res[..., 1], vol[..., 1] - vol[..., 0],
                               rtol=1e-6)


def test_report_results(tmp_path):
    import pandas as pd
    run = (tmp_path / "GlaS" / "fully_sup" / "unet" / "inv_temp-1"
           / "regime-100" / "run-0")
    os.makedirs(run)
    pd.DataFrame([{"segm/dice": 0.9, "segm/jaccard": 0.8}]).to_csv(
        run / "test.csv", index=False)
    run2 = (tmp_path / "GlaS" / "fully_sup" / "unet" / "inv_temp-1"
            / "regime-100" / "run-1")
    os.makedirs(run2)
    pd.DataFrame([{"segm/dice": 0.8, "segm/jaccard": 0.7}]).to_csv(
        run2 / "test.csv", index=False)
    tool = _load_tool("report_results")
    summary = tool.main(["--exp_root", str(tmp_path)])
    assert abs(float(summary[("segm/dice", "mean")].iloc[0]) - 0.85) < 1e-9


def test_visualize_weights(tmp_path):
    import jax
    import jax.numpy as jnp

    from hebbax.models import get_network
    from hebbax.utils.checkpoint import save_snapshot
    model = get_network("unet", 3, 2)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 3)), train=False)
    save_snapshot(v, str(tmp_path), threshold=0.5, save_best=False)
    tool = _load_tool("visualize_weights")
    out = tmp_path / "filters.png"
    tool.main(["--snapshot", str(tmp_path / "last.ckpt"),
               "--out", str(out)])
    assert out.exists()


def test_dmey_filter_table():
    """dmey: 62-tap discrete-Meyer table — sum sqrt(2), near-orthogonal
    (the FIR truncation's known ~1e-3 deviation), pywt-compatible output
    size floor((n+flen-1)/2)."""
    import numpy as np

    from hebbax.ops.wavelets import dwt2, filters

    lo, hi = filters("dmey")
    assert len(lo) == 62
    np.testing.assert_allclose(lo.sum(), np.sqrt(2.0), rtol=1e-10)
    np.testing.assert_allclose((lo ** 2).sum(), 1.0, atol=3e-3)
    np.testing.assert_allclose(np.dot(lo, hi), 0.0, atol=1e-12)
    img = np.random.default_rng(0).random((64, 64)).astype(np.float32)
    ll, (lh, hl, hh) = dwt2(img, "dmey")
    assert ll.shape == (62, 62) and hh.shape == (62, 62)
    # LL of a constant image is (approximately) the constant * 2
    const, _ = dwt2(np.ones((64, 64), np.float32), "dmey")
    np.testing.assert_allclose(const[8:-8, 8:-8], 2.0, atol=2e-3)


def test_atrial_preprocess_tool(tmp_path):
    """tools/Atrial/preprocess.py: bbox crop with 10-20 voxel random
    margins, padded so the in-plane extent is >= 112 where the source
    allows (reference tools/Atrial/preprocess.py semantics)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "atrial_preprocess", "/root/repo/tools/Atrial/preprocess.py")
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    data = tmp_path / "raw"
    rng = np.random.default_rng(3)
    for case in ("case_a", "case_b"):
        d = data / case
        os.makedirs(d)
        img = rng.normal(80, 10, (160, 150, 44)).astype(np.float32)
        mask = np.zeros((160, 150, 44), np.uint8)
        # small blob: the 112 in-plane floor must kick in
        mask[70:90, 60:85, 10:30] = 255
        write_nrrd(d / "lgemri.nrrd", img)
        write_nrrd(d / "laendo.nrrd", mask)
    (data / "notadir.txt").write_text("ignored")

    out_i, out_m = tmp_path / "img", tmp_path / "msk"
    tool.main(["--data_path", str(data), "--save_image_path", str(out_i),
               "--save_mask_path", str(out_m), "--seed", "0"])

    for case in ("case_a", "case_b"):
        ci, _ = read_nrrd(out_i / f"{case}.nrrd")
        cm, _ = read_nrrd(out_m / f"{case}.nrrd")
        assert ci.shape == cm.shape
        # in-plane floor: >= 112 per axis (source is large enough)
        assert ci.shape[0] >= 112 and ci.shape[1] >= 112
        # the crop keeps every labeled voxel
        assert int((cm > 0).sum()) == 20 * 25 * 20
        # z axis untouched
        assert ci.shape[2] == 44
        # margins bounded: bbox (20, 25) + floor padding + 2*20 margin max
        assert ci.shape[0] <= 112 + 40 + 2 and ci.shape[1] <= 112 + 40 + 2
