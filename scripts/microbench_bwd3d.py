#!/usr/bin/env python
"""Split fwd/dx/dw timing of the VNet 5^3 LUConv convs (the r4 trace's
dominant backward sinks) in original vs folded layouts, to decide which
levels to fold and whether dw needs a custom formulation.

Trace evidence (scripts/trace_step3d.py, vnet_s2d bf16 96x96x80):
  up_tr64/ops/conv1 bwd 7.8 ms vs fwd 1.56 (unfolded 5^3 64->64 @48^3)
  up_tr32/ops/conv1 bwd 7.5 ms vs fwd 2.17 (folded full-res stack)

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
    @jax.jit
    def run(c0):
        def body(c, _):
            y = op(c)
            nudge = (1 + 1e-30 * jnp.sum(y).astype(jnp.float32)).astype(
                c.dtype)
            return c * nudge, ()
        c, _ = lax.scan(body, c0, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    np.asarray(run(x0))

    def t(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = run(x0)
        np.asarray(out)
        return time.perf_counter() - t0

    t1, t2 = t(2), t(6)
    per = (t2 - t1) / (4 * REPS)
    return per, flops / per / 1e12


def bench_site(sp, ci, co, k, f, label):
    """fwd / dx / dw of one conv (original-resolution spec sp, ci->co,
    k^3, SAME padding), folded by f if given (trimmed folded_k)."""
    rs = np.random.RandomState(0)
    w0 = jnp.asarray(rs.rand(k, k, k, ci, co) * 0.1, DTYPE)
    flops = 2 * int(np.prod(sp)) * (k ** 3) * ci * co
    if f is None:
        x = jnp.asarray(rs.rand(1, *sp, ci), DTYPE)
        w = w0
        pad = ((k // 2, k // 2),) * 3
    else:
        spf = tuple(s // a for s, a in zip(sp, f))
        x = jnp.asarray(rs.rand(1, *spf, s2d3d.prodf(f) * ci), DTYPE)
        w = s2d3d.fold_conv_kernel3(w0, (ci,), f)
        pad = s2d3d.folded_pad3(k, f)

    def conv(xx, ww):
        return lax.conv_general_dilated(
            xx, ww, (1, 1, 1), list(pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    per_f, tf_f = _timed_scan(lambda c: conv(c, w), x, flops)

    # dx: cotangent has the conv's output shape
    g = conv(x, w)
    dx = jax.vjp(lambda xx: conv(xx, w), x)[1]
    per_dx, tf_dx = _timed_scan(lambda c: dx(c)[0], g, flops)

    # dw: cotangent fixed, vary x via the scan carry
    def dw_of(xx):
        return jax.vjp(lambda ww: conv(xx, ww), w)[1](g)[0]

    # carry is x; output is the kernel grad — nudge x by sum(dw)
    per_dw, tf_dw = _timed_scan(dw_of, x, flops)
    print(f"  {label:34s} fwd {per_f*1e3:7.3f}  dx {per_dx*1e3:7.3f}  "
          f"dw {per_dw*1e3:7.3f} ms   ({tf_f:5.1f}/{tf_dx:5.1f}/"
          f"{tf_dw:5.1f} TF/s orig-math)", flush=True)


def main():
    print(f"dtype={DTYPE.__name__}, REPS={REPS}")
    half = (48, 48, 40)
    full = (96, 96, 80)
    print("== up_tr64.ops conv 5^3 64->64 @half (the #1 bwd sink) ==")
    bench_site(half, 64, 64, 5, (2, 2, 1), "fold (2,2,1)")
    bench_site(half, 64, 64, 5, (2, 1, 1), "fold (2,1,1)")
    print("== up_tr32.ops conv 5^3 32->32 @full (folded today) ==")
    bench_site(full, 32, 32, 5, (2, 2, 2), "fold (2,2,2)")
    bench_site(full, 32, 32, 5, (2, 2, 1), "fold (2,2,1)")
    print("== down_tr64.ops conv 5^3 64->64 @quarter ==")
    bench_site((24, 24, 20), 64, 64, 5, None, "orig")
    bench_site((24, 24, 20), 64, 64, 5, (2, 2, 1), "fold (2,2,1)")
    print("== up_tr128.ops conv 5^3 128->128 @quarter ==")
    bench_site((24, 24, 20), 128, 128, 5, None, "orig")
    bench_site((24, 24, 20), 128, 128, 5, (2, 2, 2), "fold (2,2,2)")


if __name__ == "__main__":
    main()
