#!/usr/bin/env python
"""Honest timing of the 2D MLP-head convs (unet.py:449-455 shapes) in
original vs 2x2-folded vs double-folded (4x4) layouts, fwd and fwd+bwd,
to decide the head fold depth for unet_s2d (CLAUDE.md round-4 #2).

The head runs at the full 128² resolution with C = 16/16/8/2 — the
worst MXU lane shapes in the model.  Each extra fold x4s the (dense)
FLOPs but packs the lane axis: 64 -> 256 channels.

Env: BENCH_DTYPE (bf16|f32), REPS, BATCH.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hebbax.ops import s2d

REPS = int(os.environ.get("REPS", "20"))
BATCH = int(os.environ.get("BATCH", "32"))
DTYPE = (jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
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


def fold_n(x, depth):
    for _ in range(depth):
        x = s2d.fold(x)
    return x


def head_convs(depth):
    """The 3 head convs (MLPHead, unet.py:449-455: 16->64, 64->32,
    32->2) folded `depth` times.  Returns (apply, x0, orig_flops)."""
    rs = np.random.RandomState(0)
    sz = 128
    ws = []
    for ci, co in ((16, 64), (64, 32), (32, 2)):
        w = jnp.asarray(rs.rand(3, 3, ci, co) * 0.1, DTYPE)
        for d in range(depth):
            w = s2d.fold_conv_kernel(w, (ci * 4 ** d,))
        ws.append(w)
    x0 = jnp.asarray(rs.rand(BATCH, sz, sz, 16), DTYPE)
    x0 = fold_n(x0, depth)
    pad = ((1, 1), (1, 1))

    def apply(x):
        y = x
        for w in ws:
            y = lax.conv_general_dilated(
                y, w, (1, 1), list(pad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y, 0)
        return y

    flops = 2 * sz * sz * BATCH * 9 * (16 * 64 + 64 * 32 + 32 * 2)
    return apply, x0, flops


def main():
    print(f"dtype={DTYPE.__name__}, REPS={REPS}, batch={BATCH}")
    for depth in (0, 1, 2):
        apply, x0, flops = head_convs(depth)
        per, tf = _timed_scan(apply, x0, flops)
        print(f"  head fwd  depth={depth} ({x0.shape}): "
              f"{per*1e3:8.3f} ms  {tf:6.1f} TF/s(orig-math)", flush=True)

        # fwd+bwd: grads wrt input (dx path of the preceding layer) —
        # weight grads excluded here (same formulation either way)
        def loss(x):
            return jnp.sum(apply(x).astype(jnp.float32))

        g = jax.grad(lambda x: loss(x))
        per_b, _ = _timed_scan(lambda c: g(c), x0, flops)
        print(f"  head f+b  depth={depth}: {per_b*1e3:8.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
