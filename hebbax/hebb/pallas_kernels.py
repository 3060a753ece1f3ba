"""Pallas TPU kernel for the SWTA Hebbian update (the pretraining hot
path; SURVEY.md section 7 names this the prime fusion candidate).

The XLA-composed path (rules.swta_conv_delta) materializes
r = softmax(k*y) in HBM and re-reads it for the weight-gradient
convolution.  This kernel fuses both: one pass over each sample computes
the softmax in VMEM and accumulates

    pos[di,dj,i,o] = sum_{n,p,q} r[n,p,q,o] * x[n, p+di, q+dj, i]
    r_sum[o]       = sum r[...,o]

into VMEM-resident accumulators via k*k MXU contractions per row chunk
(delta = pos - r_sum * w is a cheap elementwise epilogue).

Layout note: blocks are channel-FIRST (N, C, H, W) — with channels-last
the small channel counts of the UNet (16..256) land on the 128-lane axis
and VMEM tiles pad 8x, blowing the 16M scoped budget; with W on the lane
axis the padding is negligible.

Status: numerics validated on the real chip (rel err 3e-6 vs the XLA
rule).  The kernel is OPT-IN via HEBBAX_ENABLE_PALLAS=1 and the
XLA-composed rule is the default — a MEASURED negative result: with
honest in-dispatch scan timing (scripts/microbench_delta.py; round 1's
"1.66x isolated win" predated the discovery that block_until_ready
does not block through the TPU tunnel) the kernel loses both isolated
(2.32 vs 1.66 ms per delta at the 128² 16ch bs=32 hot shape — the
channels-last -> channel-first transposes it needs dominate) and
end-to-end (pretrain step 21.9 vs 19.3 ms).  The winning layout fix
for small-channel convs on this hardware is space-to-depth folding
(ops/s2d.py), not a fused kernel.

Mosaic constraints honored: 3D channel-first blocks (4D dynamic vector
loads unsupported; channels-last lane padding blows VMEM 8x), 8-aligned
sublane offsets via chunk-multiple rows + aligned superset loads with
in-register halo slicing, shapes gated to lane multiples.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _swta_kernel(k_temp, kh, kw, chunk, x_ref, y_ref, pos_ref, rsum_ref):
    """x_ref: (I, Hp, Wp) one sample channel-first; y_ref: (O, H, W);
    pos_ref: (kh*kw*I, O); rsum_ref: (1, O).  3D blocks — Mosaic's
    dynamic vector loads fail on 4D refs."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        pos_ref[:] = jnp.zeros_like(pos_ref)
        rsum_ref[:] = jnp.zeros_like(rsum_ref)

    o, h, w = y_ref.shape
    i = x_ref.shape[0]

    def body(c, _):
        row = pl.multiple_of(c * chunk, chunk)
        y = y_ref[:, pl.ds(row, chunk), :]             # (O, chunk, W)
        r = jax.nn.softmax(k_temp * y, axis=0)
        r2 = r.reshape(o, chunk * w)
        rsum_ref[:] += jnp.sum(r2, axis=1)[None, :]
        # aligned superset load (row is a chunk multiple; the +di halo is
        # sliced in-register — Mosaic requires 8-aligned memory offsets)
        halo = ((kh - 1 + 7) // 8) * 8 if kh > 1 else 0
        xs_all = x_ref[:, pl.ds(row, chunk + halo), :]  # (I, chunk+halo, Wp)
        for di in range(kh):
            for dj in range(kw):
                xs = lax.slice(xs_all, (0, di, dj),
                               (i, di + chunk, dj + w)).reshape(
                                   i, chunk * w)
                acc = lax.dot_general(
                    xs, r2, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (I, O)
                idx = di * kw + dj
                pos_ref[idx * i:(idx + 1) * i, :] += acc
        return 0

    lax.fori_loop(0, h // chunk, body, 0)


def swta_delta_pallas(w, x, y, k_temp, interpret=False):
    """Fused SWTA delta for 2D stride-1 convs.

    w: (kh, kw, I, O); x: (N, H+kh-1, W+kw-1, I) pre-padded channels-last
    input; y: (N, H, W, O) pre-activation.  Returns delta in w's shape.
    interpret=True runs the Pallas interpreter (CPU testing).
    """
    kh, kw, i, o = w.shape
    n, h, wd, _ = y.shape
    chunk = 16
    while h % chunk:
        chunk //= 2
    # (N, I, Hp, Wp) folded to (N*I, Hp, Wp): Mosaic handles 3D blocks.
    # Rows padded so the kernel's aligned superset loads stay in bounds.
    halo = ((kh - 1 + 7) // 8) * 8 if kh > 1 else 0
    x_cf = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)
    extra = (h + halo) - (h + kh - 1)
    if extra > 0:
        x_cf = jnp.pad(x_cf, [(0, 0), (0, 0), (0, extra), (0, 0)])
    x_cf = x_cf.reshape(n * i, h + max(halo, kh - 1), wd + kw - 1)
    y_cf = jnp.transpose(y, (0, 3, 1, 2)).astype(jnp.float32).reshape(
        n * o, h, wd)
    kernel = functools.partial(_swta_kernel, float(k_temp), kh, kw, chunk)
    pos, rsum = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((i, h + max(halo, kh - 1), wd + kw - 1),
                         lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o, h, wd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((kh * kw * i, o), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kh * kw * i, o), jnp.float32),
            jax.ShapeDtypeStruct((1, o), jnp.float32),
        ],
        interpret=interpret,
    )(x_cf, y_cf)
    pos = pos.reshape(kh, kw, i, o)
    return pos - rsum[0] * w


# VMEM budget heuristic for the channel-first blocks (double-buffered)
_VMEM_BUDGET = 12 * 1024 * 1024


def _fits_vmem(w, x, y):
    kh, kw, i, o = w.shape
    xb = i * (y.shape[1] + kh - 1) * (y.shape[2] + kw - 1) * 4
    yb = o * y.shape[1] * y.shape[2] * 4
    acc = kh * kw * i * o * 4
    return 2 * (xb + yb) + acc < _VMEM_BUDGET


def swta_delta(w, x, y, k_temp, strides, padding=None):
    """Dispatcher: fused Pallas kernel when eligible (TPU, 2D, stride 1,
    fits VMEM, lane-friendly shape; disable with HEBBAX_DISABLE_PALLAS),
    else the XLA rule.  The shape gate keeps Mosaic to layouts it has
    validated (W a lane multiple, H a sublane-chunk multiple) — the
    full-resolution layers, which dominate the update FLOPs.

    padding: native-padding config when x is unpadded (the kernel needs
    a materialized pad; the XLA rule pads inside the conv)."""
    from . import rules
    if (pallas_available() and w.ndim == 4
            and tuple(strides) == (1, 1)
            and y.shape[2] % 128 == 0 and y.shape[1] % 8 == 0):
        xp = x
        if padding is not None and any(lo or hi for lo, hi in padding):
            xp = jnp.pad(x, [(0, 0)] + [list(p) for p in padding]
                         + [(0, 0)])
        if _fits_vmem(w, xp, y):
            return swta_delta_pallas(w, lax.stop_gradient(xp),
                                     lax.stop_gradient(y), k_temp)
    return rules.swta_conv_delta(w, x, y, k_temp, tuple(strides),
                                 padding=padding)


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    if not _PALLAS_OK or not os.environ.get("HEBBAX_ENABLE_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
