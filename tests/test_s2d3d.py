"""Exactness of the 3D space-to-depth machinery (ops/s2d3d.py) against
the unfolded ops, for all fold-factor combinations in {1,2}^3."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 3D folded-kernel parity vs unfolded (many conv3d configs)

import jax
import jax.numpy as jnp

from hebbax.hebb import rules
from hebbax.ops import s2d3d

FACTORS = [(2, 2, 2), (2, 2, 1), (2, 1, 1), (1, 2, 2), (1, 1, 2)]


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape),
                       jnp.float32)


@pytest.mark.parametrize("f", FACTORS)
def test_fold_unfold_roundtrip(f):
    x = _rand((2, 4, 4, 4, 3), 0)
    assert jnp.array_equal(s2d3d.unfold3(s2d3d.fold3(x, f), f), x)


@pytest.mark.parametrize("f", FACTORS)
def test_folded_conv_exact(f):
    """3x3x3 stride-1 same-pad conv == folded conv on folded input."""
    ci, co = 3, 5
    x = _rand((2, 4, 4, 4, ci), 1)
    w = _rand((3, 3, 3, ci, co), 2)
    pad = ((1, 1),) * 3
    ref = rules.conv_fwd(x, w, (1, 1, 1), pad)
    wf = s2d3d.fold_conv_kernel3(w, (ci,), f)
    yf = rules.conv_fwd(s2d3d.fold3(x, f), wf, (1, 1, 1), pad)
    out = s2d3d.unfold3(yf, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_folded_conv_groups():
    """Concat of two folded sources == folded conv with in_groups."""
    f = (2, 2, 2)
    g1, g2, co = 2, 3, 4
    a = _rand((1, 4, 4, 4, g1), 3)
    b = _rand((1, 4, 4, 4, g2), 4)
    w = _rand((3, 3, 3, g1 + g2, co), 5)
    pad = ((1, 1),) * 3
    ref = rules.conv_fwd(jnp.concatenate([a, b], -1), w, (1, 1, 1), pad)
    xf = jnp.concatenate([s2d3d.fold3(a, f), s2d3d.fold3(b, f)], -1)
    wf = s2d3d.fold_conv_kernel3(w, (g1, g2), f)
    out = s2d3d.unfold3(rules.conv_fwd(xf, wf, (1, 1, 1), pad), f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


@pytest.mark.parametrize("f", FACTORS)
def test_wgrad_unfold_exact(f):
    """Folded wgrad mapped back == original-layout wgrad."""
    ci, co = 2, 3
    x = _rand((1, 4, 4, 4, ci), 6)
    cot = _rand((1, 4, 4, 4, co), 7)
    pad = ((1, 1),) * 3
    ref = rules._wgrad(rules.conv_fwd, x, (3, 3, 3, ci, co), cot,
                       (1, 1, 1), pad)
    wf_shape = s2d3d.folded_kernel_shape3(3, (ci,), co, f)
    gf = rules._wgrad(rules.conv_fwd, s2d3d.fold3(x, f), wf_shape,
                      s2d3d.fold3(cot, f), (1, 1, 1), pad)
    out = s2d3d.unfold_wgrad3(gf, 3, (ci,), co, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


@pytest.mark.parametrize("f", FACTORS)
def test_subpixel_max_is_maxpool(f):
    from hebbax.models.common import max_pool
    x = _rand((2, 4, 4, 4, 3), 8)
    ref = max_pool(x)
    out = s2d3d.subpixel_max3(s2d3d.fold3(x, f), f)
    assert jnp.array_equal(out, ref)


def test_transpose_matrix_exact():
    """k=2/s=2 transpose == 1x1 matmul emitting the folded output."""
    f = (2, 2, 2)
    ci, co = 3, 4
    x = _rand((2, 3, 4, 5, ci), 9)
    w = _rand((2, 2, 2, ci, co), 10)
    ref = rules.conv_transpose_fwd(x, w, (2, 2, 2))
    wm = s2d3d.transpose_kernel_matrix(w, f)
    yf = jnp.einsum("...i,ie->...e", x, wm)
    out = s2d3d.unfold3(yf, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_fold_bias():
    b = jnp.arange(3.0)
    bf = s2d3d.fold_bias3(b, (2, 2, 1))
    assert bf.shape == (12,)
    x = jnp.zeros((1, 2, 2, 4, 12))
    assert jnp.array_equal(
        s2d3d.unfold3(x + bf, (2, 2, 1))[0, 0, 0, 0], b)


@pytest.mark.parametrize("f", FACTORS)
def test_fold_transpose_kernel_exact(f):
    """k2/s2 transpose emitting a partially/fully folded output ==
    fold3 of the unfolded transpose output."""
    ci, co = 3, 4
    x = _rand((2, 3, 4, 5, ci), 11)
    w = _rand((2, 2, 2, ci, co), 12)
    ref = s2d3d.fold3(rules.conv_transpose_fwd(x, w, (2, 2, 2)), f)
    wf, strides = s2d3d.fold_transpose_kernel3(w, f)
    got = rules.conv_transpose_fwd(x, wf, strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


@pytest.mark.parametrize("f", FACTORS)
def test_folded_conv_k5_trimmed_exact(f):
    """5x5x5 stride-1 same-pad conv == TRIMMED folded conv (folded_k
    taps, pad folded_k//2) on the folded input — the VNet LUConv case."""
    ci, co = 2, 3
    x = _rand((1, 8, 8, 8, ci), 6)
    w = _rand((5, 5, 5, ci, co), 7)
    ref = rules.conv_fwd(x, w, (1, 1, 1), ((2, 2),) * 3)
    wf = s2d3d.fold_conv_kernel3(w, (ci,), f)
    assert wf.shape == s2d3d.folded_kernel_shape3(5, (ci,), co, f)
    yf = rules.conv_fwd(s2d3d.fold3(x, f), wf, (1, 1, 1),
                        s2d3d.folded_pad3(5, f))
    out = s2d3d.unfold3(yf, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)


@pytest.mark.parametrize("f", FACTORS)
def test_k5_wgrad_unfold_exact(f):
    """Trimmed-folded 5^3 wgrad mapped back == original wgrad."""
    ci, co = 2, 3
    x = _rand((1, 8, 8, 8, ci), 8)
    cot = _rand((1, 8, 8, 8, co), 9)
    ref = rules._wgrad(rules._conv_fwd_raw, x, (5, 5, 5, ci, co), cot,
                       (1, 1, 1), ((2, 2),) * 3)
    xf = s2d3d.fold3(x, f)
    cf = s2d3d.fold3(cot, f)
    wf_shape = s2d3d.folded_kernel_shape3(5, (ci,), co, f)
    gf = rules._wgrad(rules._conv_fwd_raw, xf, wf_shape, cf, (1, 1, 1),
                      s2d3d.folded_pad3(5, f))
    got = s2d3d.unfold_wgrad3(gf, 5, (ci,), co, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=3e-4)


@pytest.mark.parametrize("f", FACTORS)
def test_fold_down_kernel_exact(f):
    """k2/s2 strided conv on the original == fold_down_kernel3 conv on
    the folded input (the VNet down_conv-as-matmul path)."""
    ci, co = 3, 4
    x = _rand((2, 8, 8, 8, ci), 10)
    w = _rand((2, 2, 2, ci, co), 11)
    ref = rules.conv_fwd(x, w, (2, 2, 2))
    wf, strides = s2d3d.fold_down_kernel3(w, f)
    got = rules.conv_fwd(s2d3d.fold3(x, f), wf, strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_regroup3_matches_unfold_concat():
    f = (2, 2, 2)
    a = _rand((1, 4, 4, 4, 3), 12)
    b = _rand((1, 4, 4, 4, 5), 13)
    grouped = jnp.concatenate([s2d3d.fold3(a, f), s2d3d.fold3(b, f)], -1)
    std = s2d3d.regroup3(grouped, (3, 5), f)
    ref = s2d3d.fold3(jnp.concatenate([a, b], -1), f)
    assert jnp.array_equal(std, ref)
