#!/usr/bin/env python
"""Chained, fetch-forced microbenchmarks of the ops that make up the
UNet train steps: convs at every (resolution, channels) level, dropout,
batchnorm, maxpool.  Reports achieved TFLOP/s / GB/s per op so the step
optimization work targets the real sinks (see hebbax/utils/timing.py for
why naive block_until_ready loops lie through the axon tunnel).
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


def slope_time(step, carry, *args, n1=10, n2=30):
    def run(n):
        y = carry
        t0 = time.perf_counter()
        for _ in range(n):
            y, out = step(y, *args)
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def chain(fn):
    @jax.jit
    def step(x, *args):
        out = fn(x, *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        nudge = (1 + 1e-30 * jnp.sum(leaf)).astype(x.dtype)
        return x * nudge, out
    return step


def conv_at(size, ci, co, dtype=jnp.float32):
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, size, size, ci),
                    dtype)
    w = jnp.asarray(np.random.RandomState(1).rand(3, 3, ci, co) * 0.1,
                    dtype)

    def fn(x_, w_):
        return lax.conv_general_dilated(
            x_, w_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = slope_time(chain(fn), x, w)
    fl = 2 * BATCH * size * size * 9 * ci * co
    print(f"conv3x3 {size:3d}^2 {ci:3d}->{co:3d} {np.dtype(dtype).name}: "
          f"{dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)


def main():
    print(f"bs={BATCH}")
    for dtype in (jnp.float32, jnp.bfloat16):
        for size, ci, co in ((128, 16, 16), (64, 32, 32), (32, 64, 64),
                             (16, 128, 128), (8, 256, 256),
                             (128, 16, 64), (128, 64, 32),
                             (128, 128, 128)):
            conv_at(size, ci, co, dtype)

    # dropout at the head's hot shape
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 128, 128, 64),
                    jnp.float32)
    key = jax.random.PRNGKey(0)

    def drop(x_, key_):
        keep = jax.random.bernoulli(key_, 0.5, x_.shape)
        return jnp.where(keep, x_ / 0.5, 0.0)

    dt = slope_time(chain(drop), x, key)
    nbytes = x.size * 4 * 2
    print(f"dropout 128^2x64 f32: {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:6.0f} GB/s", flush=True)

    # batchnorm-ish: normalize over N,H,W
    def bn(x_):
        m = jnp.mean(x_, axis=(0, 1, 2))
        v = jnp.var(x_, axis=(0, 1, 2))
        return (x_ - m) * lax.rsqrt(v + 1e-5)

    dt = slope_time(chain(bn), x)
    print(f"batchnorm 128^2x64 f32: {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:6.0f} GB/s", flush=True)

    # maxpool
    def mp(x_):
        return lax.reduce_window(x_, -jnp.inf, lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")

    dt = slope_time(chain(mp), x)
    print(f"maxpool2 128^2x64 f32: {dt*1e3:7.3f} ms  "
          f"{x.size*4*1.25/dt/1e9:6.0f} GB/s", flush=True)

    # padded conv: manual jnp.pad + VALID (the HConv pattern) vs native
    x3 = jnp.asarray(np.random.RandomState(0).rand(BATCH, 128, 128, 16),
                     jnp.float32)
    w3 = jnp.asarray(np.random.RandomState(1).rand(3, 3, 16, 16) * 0.1,
                     jnp.float32)

    def manual(x_, w_):
        xp = jnp.pad(x_, [(0, 0), (1, 1), (1, 1), (0, 0)])
        return lax.conv_general_dilated(
            xp, w_, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = slope_time(chain(manual), x3, w3)
    fl = 2 * BATCH * 128 * 128 * 9 * 16 * 16
    print(f"conv3x3 manual-pad 128^2 16->16: {dt*1e3:7.3f} ms  "
          f"{fl/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
