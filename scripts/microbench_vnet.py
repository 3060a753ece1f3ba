#!/usr/bin/env python
"""Honest (fetch-forced, in-dispatch scan) timing of the VNet top
levels' 5^3 convs in original vs space-to-depth folded layouts, to pick
fold factors before building models/vnet_s2d.py.

VNet (models/vnet.py; reference vnet.py:44-195) spends its full-res
work at C=16/32 with 5^3 kernels — 8x/4x MXU lane padding.  The trimmed
folded kernel (s2d3d.folded_k: k=5, f=2 -> 3 taps) costs
(27*pf/125)x FLOPs: 1.73x at pf=8, 1.44x at pf=4.

Env: BENCH3D_DTYPE (bf16|f32), REPS.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp
from jax import lax

from hebbax.ops import s2d3d
from microbench_conv3d import DTYPE, REPS, _timed_scan


def bench_k5(sp, ci, co, f, label):
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.rand(5, 5, 5, ci, co) * 0.1, DTYPE)
    flops = 2 * int(np.prod(sp)) * 125 * ci * co  # original-math FLOPs
    if f is None:
        x = jnp.asarray(rs.rand(1, *sp, ci), DTYPE)
        pad = ((2, 2),) * 3
        op = lambda c: lax.conv_general_dilated(
            c, w, (1, 1, 1), list(pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    else:
        spf = tuple(s // a for s, a in zip(sp, f))
        x = jnp.asarray(
            rs.rand(1, *spf, s2d3d.prodf(f) * ci), DTYPE)
        wf = s2d3d.fold_conv_kernel3(w, (ci,), f)
        pad = s2d3d.folded_pad3(5, f)
        op = lambda c: lax.conv_general_dilated(
            c, wf, (1, 1, 1), list(pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    per, tf = _timed_scan(op, x, flops)
    print(f"  {label:42s} {per*1e3:8.3f} ms  {tf:6.1f} TF/s(orig-math)",
          flush=True)
    return per


def bench_down(sp, ci, co, f):
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.rand(2, 2, 2, ci, co) * 0.1, DTYPE)
    flops = 2 * int(np.prod(sp)) * ci * co  # 8 taps / 8 stride cells
    if f is None:
        x = jnp.asarray(rs.rand(1, *sp, ci), DTYPE)
        op = lambda c: lax.conv_general_dilated(
            c, w, (2, 2, 2), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        tag = "orig k2s2"
    else:
        spf = tuple(s // a for s, a in zip(sp, f))
        x = jnp.asarray(rs.rand(1, *spf, s2d3d.prodf(f) * ci), DTYPE)
        wf, strides = s2d3d.fold_down_kernel3(w, f)
        op = lambda c: lax.conv_general_dilated(
            c, wf, strides, "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        tag = f"down-from-fold {f}"
    per, tf = _timed_scan(op, x, flops)
    print(f"  down {sp} {ci}->{co} [{tag:20s}] {per*1e3:8.3f} ms  "
          f"{tf:6.1f} TF/s", flush=True)


def main():
    print(f"dtype={DTYPE.__name__}, REPS={REPS}")
    sp0, sp1 = (96, 96, 80), (48, 48, 40)
    print("== in_tr conv 5^3 1->16 @full ==")
    bench_k5(sp0, 1, 16, None, "orig")
    bench_k5(sp0, 1, 16, (2, 2, 2), "fold (2,2,2)")
    print("== LUConv 5^3 16->16 @full (up_tr32.ops etc.) ==")
    bench_k5(sp0, 16, 16, None, "orig")
    bench_k5(sp0, 16, 16, (2, 2, 2), "fold (2,2,2)")
    bench_k5(sp0, 16, 16, (2, 2, 1), "fold (2,2,1)")
    print("== LUConv 5^3 32->32 @full (up_tr32 stack width) ==")
    bench_k5(sp0, 32, 32, None, "orig")
    bench_k5(sp0, 32, 32, (2, 2, 2), "fold (2,2,2)")
    bench_k5(sp0, 32, 32, (2, 2, 1), "fold (2,2,1)")
    print("== out_tr conv 5^3 32->2 @full ==")
    bench_k5(sp0, 32, 2, None, "orig")
    bench_k5(sp0, 32, 2, (2, 2, 2), "fold (2,2,2)")
    print("== LUConv 5^3 32->32 @half (down_tr32.ops) ==")
    bench_k5(sp1, 32, 32, None, "orig")
    bench_k5(sp1, 32, 32, (2, 2, 2), "fold (2,2,2)")
    print("== down_conv k2s2 16->32 @full ==")
    bench_down(sp0, 16, 32, None)
    bench_down(sp0, 16, 32, (2, 2, 2))


if __name__ == "__main__":
    main()
