#!/usr/bin/env python
"""Honest (fetch-forced, in-dispatch scan) comparison of the SWTA delta
paths: XLA-composed rule vs the fused Pallas kernel, at the UNet's
full-resolution layer shapes.

Each timing runs REPS delta computations inside ONE dispatch via
lax.scan (so neither tunnel dispatch rate nor fetch RTT contaminates
the slope), chained through a nudge of x.

Env: HEBBAX_ENABLE_PALLAS=1 to time the Pallas path; BENCH_BATCH.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
REPS = 20


def bench_shape(size, ci, co, k_temp=50.0):
    from hebbax.hebb.pallas_kernels import swta_delta

    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.rand(3, 3, ci, co) * 0.1, jnp.float32)
    x = jnp.asarray(rs.rand(BATCH, size, size, ci), jnp.float32)
    pad = ((1, 1), (1, 1))

    @jax.jit
    def run(x0, w0):
        def body(c, _):
            y = jnp.tanh(lax.conv_general_dilated(
                c, w0, (1, 1), list(pad),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
            d = swta_delta(w0, c, y, k_temp, (1, 1), padding=pad)
            nudge = (1 + 1e-30 * jnp.sum(d)).astype(c.dtype)
            return c * nudge, jnp.sum(d)
        c, outs = lax.scan(body, x0, None, length=REPS)
        return jnp.sum(outs)

    def timed(n_outer):
        t0 = time.perf_counter()
        for _ in range(n_outer):
            out = run(x, w)
        np.asarray(out)
        return time.perf_counter() - t0

    np.asarray(run(x, w))  # compile+warm
    t1, t2 = timed(2), timed(6)
    per_delta = (t2 - t1) / (4 * REPS)
    label = ("pallas" if os.environ.get("HEBBAX_ENABLE_PALLAS")
             else "xla")
    print(f"swta delta {size}^2 {ci}->{co} bs={BATCH} [{label}]: "
          f"{per_delta*1e3:7.3f} ms  (fwd conv included)", flush=True)


def main():
    for size, ci, co in ((128, 16, 16), (128, 3, 16), (64, 32, 32)):
        bench_shape(size, ci, co)


if __name__ == "__main__":
    main()
