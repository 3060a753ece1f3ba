#!/usr/bin/env python
"""Honest (fetch-forced, in-dispatch scan) timing of the 3D UNet's
top-level convs in the original vs space-to-depth folded layouts, to
pick the profitable fold factor (see ops/s2d3d.py docstring).

Each candidate runs REPS convs inside ONE dispatch via lax.scan; the
carry is nudged by a function of the FULL conv output (so XLA cannot
dead-code-eliminate any output channel), and the result is fetched —
neither dispatch rate nor fetch RTT contaminates the slope.  Also times
the k2/s2 transpose conv both ways (lhs-dilated vs matmul fast path).

Env: BENCH3D_DTYPE (bf16|f32), REPS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hebbax.ops import s2d3d

REPS = int(os.environ.get("REPS", "10"))
DTYPE = (jnp.bfloat16 if os.environ.get("BENCH3D_DTYPE", "bf16") == "bf16"
         else jnp.float32)


def _timed_scan(op, x0, flops):
    """op(c) -> y (any shape); times REPS applications per dispatch."""

    @jax.jit
    def run(c0):
        def body(c, _):
            y = op(c)
            nudge = (1 + 1e-30 * jnp.sum(y).astype(jnp.float32)).astype(
                c.dtype)
            return c * nudge, ()
        c, _ = lax.scan(body, c0, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    np.asarray(run(x0))  # compile+warm

    def t(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = run(x0)
        np.asarray(out)
        return time.perf_counter() - t0

    t1, t2 = t(2), t(6)
    per = (t2 - t1) / (4 * REPS)
    return per, flops / per / 1e12


def bench_conv(sp, ci, co, label):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, *sp, ci), DTYPE)
    w = jnp.asarray(rs.rand(3, 3, 3, ci, co) * 0.1, DTYPE)
    pad = ((1, 1),) * 3
    flops = 2 * int(np.prod(sp)) * 27 * ci * co
    per, tf = _timed_scan(
        lambda c: lax.conv_general_dilated(
            c, w, (1, 1, 1), list(pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
        x, flops)
    print(f"  {label:36s} {per*1e3:8.3f} ms  {tf:6.1f} TF/s", flush=True)
    return per


def bench_transpose(sp, ci, co, use_fast):
    from hebbax.hebb import rules
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, *sp, ci), DTYPE)
    w = jnp.asarray(rs.rand(2, 2, 2, ci, co) * 0.1, DTYPE)
    flops = 2 * int(np.prod(sp)) * 8 * ci * co

    if use_fast:
        op = lambda c: rules.conv_transpose_fwd(c, w, (2, 2, 2))
    else:
        w_flip = w[::-1, ::-1, ::-1]
        op = lambda c: lax.conv_general_dilated(
            c, w_flip, (1, 1, 1), [(1, 1)] * 3,
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    per, tf = _timed_scan(op, x, flops)
    tag = "matmul" if use_fast else "lhs-dilated"
    print(f"  upconv {sp} {ci}->{co} [{tag:11s}] {per*1e3:8.3f} ms  "
          f"{tf:6.1f} TF/s", flush=True)


def main():
    print(f"dtype={DTYPE.__name__}, REPS={REPS}")
    print("== L0 convs (orig 96x96x80 C=64) ==")
    base = bench_conv((96, 96, 80), 64, 64, "orig  (96,96,80)  64->64")
    for f in ((2, 1, 1), (2, 2, 1), (2, 2, 2)):
        sp = tuple(s // ff for s, ff in zip((96, 96, 80), f))
        c = 64 * s2d3d.prodf(f)
        per = bench_conv(sp, c, c, f"fold {f} {sp} {c}->{c}")
        print(f"    -> vs orig: {base/per:5.2f}x  "
              f"({s2d3d.prodf(f)}x FLOPs)", flush=True)
    print("== dec1 conv1 equivalents (orig 128->64) ==")
    base = bench_conv((96, 96, 80), 128, 64, "orig  (96,96,80) 128->64")
    for f in ((2, 1, 1), (2, 2, 2)):
        sp = tuple(s // ff for s, ff in zip((96, 96, 80), f))
        per = bench_conv(sp, 128 * s2d3d.prodf(f), 64 * s2d3d.prodf(f),
                         f"fold {f} {sp}")
        print(f"    -> vs orig: {base/per:5.2f}x", flush=True)
    print("== L1 convs (orig 48x48x40 C=128) ==")
    base = bench_conv((48, 48, 40), 128, 128, "orig  (48,48,40) 128->128")
    per = bench_conv((24, 24, 20), 1024, 1024, "fold (2,2,2) (24,24,20)")
    print(f"    -> vs orig: {base/per:5.2f}x (8x FLOPs)", flush=True)
    print("== upconv1 (48,48,40) 128->64 ==")
    bench_transpose((48, 48, 40), 128, 64, use_fast=False)
    bench_transpose((48, 48, 40), 128, 64, use_fast=True)


if __name__ == "__main__":
    main()
