#!/usr/bin/env python
"""Honest (fetch-forced, in-dispatch scan) comparison of SWTA delta
FORMULATIONS at the pretrain path's dominant site (C=16 @ 128² — the
small-channel wgrad convs run ~4 TF/s, CLAUDE.md roofline).

Variants (all compute the FULL delta: pos - r_sum * w, identical math):
  orig-conv      conv-wgrad in original layout (rules.swta_conv_delta —
                 the shipping path)
  orig-im2col    conv_general_dilated_patches + one dense matmul
  orig-shifts    9 static shifted slices, each a (Ci, Co) matmul
  fold-conv      folded-layout conv-wgrad + selector unfold
                 (HEBBAX_S2D_FOLDED_DELTA — measured slower in r2)
  fold-shifts    folded layout, 9 static shifted slices, each a
                 (4Ci, 4Co) matmul + selector unfold

Each timing runs REPS deltas inside ONE dispatch via lax.scan chained
through a nudge of x, so neither tunnel dispatch rate nor fetch RTT
contaminates the number.  Env: BENCH_BATCH, WGRAD_DTYPE (f32|bf16).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hebbax.hebb import rules
from hebbax.ops import s2d

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
REPS = 20
DTYPE = (jnp.bfloat16 if os.environ.get("WGRAD_DTYPE") == "bf16"
         else jnp.float32)
PAD = ((1, 1), (1, 1))


def softmax_r(y, k_temp):
    return jax.nn.softmax(k_temp * y, axis=-1)


def orig_conv(w, x, y, k_temp):
    return rules.swta_conv_delta(w, x, y, k_temp, (1, 1), padding=PAD)


def orig_im2col(w, x, y, k_temp):
    r = softmax_r(y, k_temp)
    ci, co = w.shape[2], w.shape[3]
    # patches feature order: (C, kh, kw) — lax docs; only layout matters
    p = lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), list(PAD),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    pos = jnp.einsum("nhwp,nhwo->po", p, r)
    pos = pos.reshape(ci, 3, 3, co).transpose(1, 2, 0, 3)
    r_sum = jnp.sum(r, axis=(0, 1, 2))
    return pos - r_sum * w


def orig_shifts(w, x, y, k_temp):
    r = softmax_r(y, k_temp)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, wd = x.shape[1], x.shape[2]
    taps = []
    for u in range(3):
        row = []
        for v in range(3):
            xs = xp[:, u:u + h, v:v + wd, :]
            row.append(jnp.einsum("nhwi,nhwo->io", xs, r))
        taps.append(jnp.stack(row))
    pos = jnp.stack(taps)                      # (3, 3, Ci, Co)
    r_sum = jnp.sum(r, axis=(0, 1, 2))
    return pos - r_sum * w


def _folded(x, y, k_temp, co):
    xf = s2d.fold(x)
    yf = s2d.fold(y)
    rf = s2d.per_subpixel(lambda t: jax.nn.softmax(k_temp * t, axis=-1),
                          yf, co)
    return xf, rf


def fold_conv(w, x, y, k_temp):
    ci, co = w.shape[2], w.shape[3]
    xf, rf = _folded(x, y, k_temp, co)
    wf_shape = s2d.folded_kernel_shape(3, (ci,), co)
    pos_f = rules._wgrad(rules.conv_fwd, xf, wf_shape, rf, (1, 1), PAD)
    pos = s2d.unfold_wgrad(pos_f, 3, (ci,), co)
    r_sum = jnp.sum(rf.reshape(-1, 4, co), axis=(0, 1))
    return pos - r_sum * w


def fold_shifts(w, x, y, k_temp):
    ci, co = w.shape[2], w.shape[3]
    xf, rf = _folded(x, y, k_temp, co)
    xfp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    p, q = xf.shape[1], xf.shape[2]
    taps = []
    for u in range(3):
        row = []
        for v in range(3):
            xs = xfp[:, u:u + p, v:v + q, :]
            row.append(jnp.einsum("npqi,npqo->io", xs, rf))
        taps.append(jnp.stack(row))
    pos_f = jnp.stack(taps)                    # (3, 3, 4Ci, 4Co)
    pos = s2d.unfold_wgrad(pos_f, 3, (ci,), co)
    r_sum = jnp.sum(rf.reshape(-1, 4, co), axis=(0, 1))
    return pos - r_sum * w


VARIANTS = [("orig-conv", orig_conv), ("orig-im2col", orig_im2col),
            ("orig-shifts", orig_shifts), ("fold-conv", fold_conv),
            ("fold-shifts", fold_shifts)]


def check_equal(size=32, ci=16, co=16):
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.rand(3, 3, ci, co) * 0.1, jnp.float32)
    x = jnp.asarray(rs.rand(4, size, size, ci), jnp.float32)
    y = jnp.tanh(rules.conv_fwd(x, w, (1, 1), PAD))
    ref = np.asarray(orig_conv(w, x, y, 50.0))
    for name, fn in VARIANTS[1:]:
        got = np.asarray(fn(w, x, y, 50.0))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-12)
        print(f"  {name}: rel err {err:.2e}")
        assert err < 1e-4, (name, err)


def bench_shape(size, ci, co, k_temp=50.0):
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.rand(3, 3, ci, co) * 0.1, DTYPE)
    x = jnp.asarray(rs.rand(BATCH, size, size, ci), DTYPE)

    for name, fn in VARIANTS:
        @jax.jit
        def run(x0, w0, fn=fn):
            def body(c, _):
                yy = jnp.tanh(rules.conv_fwd(c, w0, (1, 1), PAD))
                d = fn(w0, c, yy, k_temp)
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
        per = (t2 - t1) / (4 * REPS)
        print(f"swta delta {size}^2 {ci}->{co} bs={BATCH} "
              f"{np.dtype(DTYPE).name} [{name:11s}]: {per*1e3:7.3f} ms "
              f"(fwd conv included)", flush=True)


def main():
    if not os.environ.get("WGRAD_SKIP_CHECK"):
        print("# exactness check (f32, small shapes)")
        check_equal()
    shapes = os.environ.get(
        "WGRAD_SHAPES", "128:16:16,64:32:32")
    for spec in shapes.split(","):
        size, ci, co = (int(t) for t in spec.split(":"))
        bench_shape(size, ci, co)


if __name__ == "__main__":
    main()
