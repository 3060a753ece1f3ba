"""Pallas SWTA kernel: math validated against the XLA-composed oracle in
interpret mode (tiny shapes; compiled-mode validation requires real TPU
Mosaic and runs opt-in via HEBBAX_ENABLE_PALLAS)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebbax.hebb import rules
import hebbax.hebb.pallas_kernels as pk

pl = pytest.importorskip("jax.experimental.pallas")


def _swta_interp(w, x, y, k_temp, chunk=2):
    kh, kw, i, o = w.shape
    n, h, wd, _ = y.shape
    x_cf = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)
    y_cf = jnp.transpose(y, (0, 3, 1, 2)).astype(jnp.float32)
    kernel = functools.partial(pk._swta_kernel, float(k_temp), kh, kw,
                               chunk)
    pos, rsum = pl.pallas_call(
        kernel, grid=(n,),
        in_specs=[
            pl.BlockSpec((1, i, h + kh - 1, wd + kw - 1),
                         lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, o, h, wd), lambda b: (b, 0, 0, 0))],
        out_specs=[
            pl.BlockSpec((kh * kw * i, o), lambda b: (0, 0)),
            pl.BlockSpec((1, o), lambda b: (0, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((kh * kw * i, o), jnp.float32),
            jax.ShapeDtypeStruct((1, o), jnp.float32)],
        interpret=True)(x_cf, y_cf)
    return pos.reshape(kh, kw, i, o) - rsum[0] * w


@pytest.mark.parametrize("shape", [(2, 4, 4, 3, 5, 3), (1, 8, 8, 4, 4, 1),
                                   (2, 4, 6, 2, 3, 3)])
def test_swta_kernel_matches_xla_oracle(shape):
    n, h, wd, i, o, k = shape
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(k, k, i, o), jnp.float32) * 0.1
    x = jnp.asarray(rng.randn(n, h + k - 1, wd + k - 1, i), jnp.float32)
    y = jnp.asarray(rng.randn(n, h, wd, o), jnp.float32)
    ref = rules.swta_conv_delta(w, x, y, 50.0, (1, 1))
    got = _swta_interp(w, x, y, 50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_dispatcher_falls_back_without_optin(monkeypatch):
    monkeypatch.delenv("HEBBAX_ENABLE_PALLAS", raising=False)
    pk.pallas_available.cache_clear()
    assert not pk.pallas_available()
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(3, 3, 2, 4), jnp.float32)
    x = jnp.asarray(rng.randn(1, 6, 6, 2), jnp.float32)
    y = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    got = pk.swta_delta(w, x, y, 20.0, (1, 1))
    ref = rules.swta_conv_delta(w, x, y, 20.0, (1, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
