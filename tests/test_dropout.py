"""FastDropout (ops/dropout.py): Bernoulli semantics with bit-packed /
16-bit-quantized randomness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebbax.ops.dropout import FastDropout


def _apply(rate, x, key=0, det=False):
    m = FastDropout(rate, deterministic=det)
    return m.apply({}, x, rngs={"dropout": jax.random.PRNGKey(key)})


def test_deterministic_and_zero_rate_identity():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    m = FastDropout(0.5, deterministic=True)
    np.testing.assert_array_equal(
        m.apply({}, x, rngs={"dropout": jax.random.PRNGKey(0)}), x)
    np.testing.assert_array_equal(_apply(0.0, x), x)


@pytest.mark.parametrize("rate", [0.5, 0.05, 0.1, 0.3])
def test_marginal_rate_and_scaling(rate):
    n = 200_000
    x = jnp.ones((n,), jnp.float32)
    y = np.asarray(_apply(rate, x))
    kept = y != 0
    frac = kept.mean()
    # binomial 5-sigma band
    assert abs(frac - (1 - rate)) < 5 * np.sqrt(rate * (1 - rate) / n)
    # kept elements scale by 1/keep_p (16-bit-quantized for non-0.5)
    scale = y[kept][0]
    assert np.allclose(y[kept], scale)
    assert abs(scale - 1.0 / (1 - rate)) < 1e-3
    # unbiased in expectation under the QUANTIZED keep probability
    thresh = round((1 - rate) * 65536)
    assert np.isclose(scale * thresh / 65536, 1.0, atol=1e-6)


def test_half_rate_bits_are_elementwise_independent():
    # adjacent elements come from the same threefry word — check their
    # bits are uncorrelated
    y = np.asarray(_apply(0.5, jnp.ones((100_000,), jnp.float32)))
    b = (y != 0).astype(np.float64)
    corr = np.corrcoef(b[:-1], b[1:])[0, 1]
    assert abs(corr) < 0.02


def test_key_determinism_and_shape_tail():
    x = jnp.ones((33,), jnp.float32)  # n % 32 != 0 exercises the pad
    a = np.asarray(_apply(0.5, x, key=7))
    b = np.asarray(_apply(0.5, x, key=7))
    c = np.asarray(_apply(0.5, x, key=8))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_bf16_passthrough_dtype():
    x = jnp.ones((64,), jnp.bfloat16)
    y = _apply(0.3, x)
    assert y.dtype == jnp.bfloat16
