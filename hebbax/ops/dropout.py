"""TPU-fast elementwise dropout.

``flax.linen.Dropout`` draws one 32-bit threefry word per element and
compares in f32 — measured ~1.25 ms per 33.5M-element site on the v5e
(CLAUDE.md), almost all of it threefry ALU.  A UNet2D train step
multiplies ~77M dropout sites, so masks cost ~3 ms of a ~16 ms step.

:class:`FastDropout` keeps the exact Bernoulli semantics but spends
8 bits of randomness per element when ``rate == 0.5`` (P(uint8 < 128)
is exactly 1/2; a 1-bit unpack was traced slower — see the inline
note) and 16 bits otherwise (keep-probability quantized to 1/65536,
exact for any rate that is a multiple of 2^-16 and ≤ 0.0008% relative
error for the model zoo's 0.05/0.1/0.2/0.3 rates).  The mask STREAM therefore differs from
``nn.Dropout`` for the same key — dropout-mask parity was never part of
the reference contract (torch draws its own stream) — while the
per-element marginal stays Bernoulli(rate), independent across
elements.

Set ``HEBBAX_SLOW_DROPOUT=1`` to fall back to ``nn.Dropout`` (A/B
measurement hook).
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class FastDropout(nn.Module):
    """Drop-in for ``nn.Dropout`` (no ``broadcast_dims`` — the
    channel-broadcast 3D sites draw one word per CHANNEL and stay on
    ``nn.Dropout``)."""

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param(
            "deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        if os.environ.get("HEBBAX_SLOW_DROPOUT"):
            return nn.Dropout(self.rate, deterministic=False,
                              name="slow")(x)
        key = self.make_rng("dropout")
        if self.rate == 0.5:
            # 8 random bits/element: P(r < 128) is exactly 1/2.  (A
            # 1-bit unpack from uint32 words was traced SLOWER — the
            # broadcast shift materializes 32x-amplified uint32
            # traffic, ~1.0 ms per 33.5M-site mask vs ~0.3 ms here.)
            r = jax.random.bits(key, x.shape, jnp.uint8)
            return jnp.where(r < jnp.uint8(128), x + x,
                             jnp.zeros_like(x))
        if self.rate >= 1.0:           # rate == 1: drop everything
            return jnp.zeros_like(x)
        thresh = round((1.0 - self.rate) * 65536)
        if thresh >= 65536:            # rate < 2^-17 rounds to keep-all
            return x
        # rate in (1 - 2^-17, 1) would round thresh to 0 and break the
        # inverted-dropout invariant E[y] = x; clamp to the smallest
        # representable keep probability (1/65536, scaled accordingly)
        thresh = max(thresh, 1)
        r = jax.random.bits(key, x.shape, jnp.uint16)
        keep = r < jnp.uint16(thresh)
        scale = jnp.asarray(65536.0 / thresh, x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))
