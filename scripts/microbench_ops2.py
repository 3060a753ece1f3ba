#!/usr/bin/env python
"""Focused layout/dtype experiments for the UNet's slow ops.

Longer chains (n1=50, n2=150) than microbench_ops.py so the ~25 ms
tunnel fetch RTT amortizes out of the slope.
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
N1 = int(os.environ.get("BENCH_N1", "50"))
N2 = int(os.environ.get("BENCH_N2", "150"))


def slope_time(step, carry, *args):
    def run(n):
        y = carry
        t0 = time.perf_counter()
        for _ in range(n):
            y, out = step(y, *args)
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(N1), run(N2)
    return max((t2 - t1) / (N2 - N1), 1e-9)


def chain(fn):
    @jax.jit
    def step(x, *args):
        out = fn(x, *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        nudge = (1 + 1e-30 * jnp.sum(leaf)).astype(x.dtype)
        return x * nudge, out
    return step


def report(name, dt, flops=None, nbytes=None):
    s = f"{name}: {dt*1e3:7.3f} ms"
    if flops:
        s += f"  {flops/dt/1e12:6.1f} TF/s"
    if nbytes:
        s += f"  {nbytes/dt/1e9:6.0f} GB/s"
    print(s, flush=True)


def main():
    rs = np.random.RandomState(0)
    size, ci, co = 128, 16, 16
    fl = 2 * BATCH * size * size * 9 * ci * co

    # 1) NHWC f32 / bf16
    for dty in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rs.rand(BATCH, size, size, ci), dty)
        w = jnp.asarray(rs.rand(3, 3, ci, co) * 0.1, dty)

        def f_nhwc(x_, w_):
            return lax.conv_general_dilated(
                x_, w_, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        report(f"conv 128^2 16->16 NHWC {np.dtype(dty).name}",
               slope_time(chain(f_nhwc), x, w), flops=fl)

    # 2) NCHW bf16
    xc = jnp.asarray(rs.rand(BATCH, ci, size, size), jnp.bfloat16)
    wc = jnp.asarray(rs.rand(co, ci, 3, 3) * 0.1, jnp.bfloat16)

    def f_nchw(x_, w_):
        return lax.conv_general_dilated(
            x_, w_, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    report("conv 128^2 16->16 NCHW bf16",
           slope_time(chain(f_nchw), xc, wc), flops=fl)

    # 3) space-to-depth folded equivalent: (128,128,16) -> (64,64,64),
    # 3x3 s1 conv becomes a 2x2 conv over folded channels producing the
    # folded output (each folded output pixel needs a 4x4 original
    # window = 2x2 folded window).  FLOPs = H*W*16*ci*co (1.78x the 3x3),
    # but lanes are 4x fuller.
    xf = jnp.asarray(rs.rand(BATCH, size // 2, size // 2, 4 * ci),
                     jnp.bfloat16)
    wf = jnp.asarray(rs.rand(2, 2, 4 * ci, 4 * co) * 0.1, jnp.bfloat16)

    def f_fold(x_, w_):
        return lax.conv_general_dilated(
            x_, w_, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fl_fold = 2 * BATCH * (size // 2) ** 2 * 4 * (4 * ci) * (4 * co)
    report("conv folded 64^2 64->64 k2 bf16 (s2d equiv)",
           slope_time(chain(f_fold), xf, wf), flops=fl_fold)

    # 4) dropout: threefry vs rbg keys
    x = jnp.asarray(rs.rand(BATCH, 128, 128, 64), jnp.float32)
    nbytes = x.size * 4 * 2

    def drop(x_, key_):
        keep = jax.random.bernoulli(key_, 0.5, x_.shape)
        return jnp.where(keep, x_ / 0.5, 0.0)

    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        report(f"dropout 128^2x64 {impl}",
               slope_time(chain(drop), x, key), nbytes=nbytes)

    # 5) maxpool f32 vs bf16
    for dty in (jnp.float32, jnp.bfloat16):
        xp = jnp.asarray(rs.rand(BATCH, 128, 128, 64), dty)

        def mp(x_):
            return lax.reduce_window(x_, -np.inf, lax.max, (1, 2, 2, 1),
                                     (1, 2, 2, 1), "VALID")

        report(f"maxpool2 128^2x64 {np.dtype(dty).name}",
               slope_time(chain(mp), xp),
               nbytes=xp.size * xp.dtype.itemsize * 1.25)

    # 6) the head's 64->32 conv, f32 vs bf16 (biggest single conv)
    for dty in (jnp.float32, jnp.bfloat16):
        xh = jnp.asarray(rs.rand(BATCH, 128, 128, 64), dty)
        wh = jnp.asarray(rs.rand(3, 3, 64, 32) * 0.1, dty)

        def fh(x_, w_):
            return lax.conv_general_dilated(
                x_, w_, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        report(f"conv 128^2 64->32 NHWC {np.dtype(dty).name}",
               slope_time(chain(fh), xh, wh),
               flops=2 * BATCH * 128 * 128 * 9 * 64 * 32)


if __name__ == "__main__":
    main()
