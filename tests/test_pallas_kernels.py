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
    return pk.swta_delta_pallas(w, x, y, k_temp, interpret=True)


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
