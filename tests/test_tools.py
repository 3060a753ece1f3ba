"""Offline tools: wavelet DWT properties, SDF, superpixel flood fill,
residuals, eval CLI."""

import os

import numpy as np
import pytest

from hebbax.ops.wavelets import dwt2, dwtn3, filters


@pytest.mark.parametrize("name", ["haar", "db2", "db4", "coif1",
                                  "bior1.5", "bior2.4"])
def test_filter_bank_properties(name):
    lo, hi = filters(name)
    # lowpass passes DC with gain sqrt(2); highpass kills DC
    assert abs(lo.sum() - np.sqrt(2)) < 1e-8
    assert abs(hi.sum()) < 1e-8


def test_haar_dwt2_known_values():
    x = np.array([[1.0, 2.0], [3.0, 4.0]])
    ll, (lh, hl, hh) = dwt2(x, "haar")
    assert ll.shape == (1, 1)
    # haar LL = mean * 2
    np.testing.assert_allclose(ll[0, 0], (1 + 2 + 3 + 4) / 2.0)


def test_dwt_output_lengths_match_pywt_formula():
    for n in (7, 8, 128):
        for name in ("haar", "db2", "bior2.4"):
            lo, _ = filters(name)
            x = np.random.RandomState(0).rand(n, n)
            ll, _ = dwt2(x, name)
            expected = (n + len(lo) - 1) // 2
            assert ll.shape == (expected, expected)


def test_dwt_constant_signal_has_zero_detail():
    x = np.full((16, 16), 3.0)
    for name in ("haar", "db2", "db4", "coif1"):
        ll, (lh, hl, hh) = dwt2(x, name)
        np.testing.assert_allclose(lh, 0, atol=1e-10)
        np.testing.assert_allclose(hh, 0, atol=1e-10)
        np.testing.assert_allclose(ll, 6.0, atol=1e-9)  # 3 * sqrt(2)^2


def test_dwtn3_bands():
    v = np.random.RandomState(1).rand(8, 8, 8)
    bands = dwtn3(v, "haar")
    assert set(bands) == {"".join(k) for k in
                          __import__("itertools").product("ad", repeat=3)}
    assert bands["aaa"].shape == (4, 4, 4)


def test_superpix_flood_fill_matches_reference_bfs():
    """Vectorized frontier expansion == the reference's queue BFS."""
    from hebbax.ops.superpix import superpix_region
    rng_img = np.random.RandomState(0)
    im = (rng_img.rand(12, 12, 3) < 0.5).astype(np.float32) * 0.5

    def reference_bfs(im, seed, thr=0.01):
        h, w = im.shape[:2]
        explored = np.zeros((h, w), bool)
        region = np.zeros((h, w), np.uint8)
        queue = [seed]
        explored[seed] = True
        while queue:
            x, y = queue.pop(0)
            region[x, y] = 1
            for xn in {max(x - 1, 0), x, min(x + 1, h - 1)}:
                for yn in {max(y - 1, 0), y, min(y + 1, w - 1)}:
                    if not explored[xn, yn] and \
                            np.abs(im[x, y] - im[xn, yn]).sum() < thr:
                        queue.append((xn, yn))
                        explored[xn, yn] = True
        return region

    class FixedSeedRng:
        def __init__(self, seed):
            self.seed = seed
            self.i = 0

        def integers(self, lo, hi):
            v = self.seed[self.i]
            self.i += 1
            return v

    seed = (5, 7)
    got = superpix_region(FixedSeedRng(seed), im)
    want = reference_bfs(im, seed)
    np.testing.assert_array_equal(got, want)


def test_mask_to_sdf_range():
    from hebbax.ops.distance import mask_to_sdf
    yy, xx = np.mgrid[:20, :20]
    mask = ((yy - 10) ** 2 + (xx - 10) ** 2) < 25
    sdf = mask_to_sdf(mask)
    assert sdf.min() >= -1 and sdf.max() <= 1
    assert sdf[10, 10] < 0          # inside negative
    assert sdf[0, 0] > 0            # far outside positive


def test_wavelet2d_tool(tmp_path):
    from PIL import Image

    import sys
    sys.path.insert(0, "/root/repo/tools")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "w2d", "/root/repo/tools/wavelet2D.py")
    w2d = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(w2d)

    src = tmp_path / "image"
    os.makedirs(src)
    arr = (np.random.RandomState(0).rand(32, 32) * 255).astype(np.uint8)
    Image.fromarray(arr).save(src / "a.png")
    w2d.main(["--image_path", str(src), "--L_path", str(tmp_path / "L"),
              "--H_path", str(tmp_path / "H"), "--wavelet_type", "haar"])
    l_img = np.array(Image.open(tmp_path / "L" / "a.png"))
    h_img = np.array(Image.open(tmp_path / "H" / "a.png"))
    assert l_img.shape == (16, 16) and h_img.shape == (16, 16)
