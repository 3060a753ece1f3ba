"""Space-to-depth folding for 3D convolutions, with per-axis factors.

Rank-3 generalization of :mod:`hebbax.ops.s2d` (see that module's
docstring for the math).  The 3D UNet family's top levels (C = 32..64 at
96x96x80) underfill the 128-wide MXU lane axis 2-4x; folding spatial
blocks into channels makes the contraction MXU-shaped at the cost of
``prod(f)``x FLOPs — so unlike the 2D case (C=16, always fold 2x2), the
profitable factor per axis must be MEASURED (scripts/microbench_conv3d.py)
and may be (2,2,2), (2,2,1), (1,1,1) = off, etc.

A 3x3x3 stride-1 conv on the original tensor is EXACTLY a 3x3x3 stride-1
conv on the folded tensor with a structured (prod(f)·Ci, prod(f)·Co)
block kernel built by :func:`fold_conv_kernel3`.  Folded channel order is
``((dz, dy, dx) subpixel-major, then c)``; concatenations of folded
tensors keep per-source blocks (``in_groups``).

The k=2/s=2 transpose conv (Decoder3D upconv) folds for FREE: its taps
never overlap, so with full per-axis folding it is a dense
``(Ci, prod(f)·Co)`` 1x1x1 conv emitting the folded output directly
(:func:`transpose_kernel_matrix`) — 1x FLOPs, ideal MXU shape.

Everything here is exact in f32 — verified against the unfolded ops in
tests/test_s2d3d.py.  Reference contract for the consumers:
/root/reference/models/networks_3d/unet3d.py:31-126.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp


def prodf(f):
    fz, fy, fx = f
    return fz * fy * fx


def fold3(x, f):
    """(N, D, H, W, C) -> (N, D/fz, H/fy, W/fx, prod(f)·C); channel
    order ((dz, dy, dx) subpixel-major, c)."""
    n, d, h, w, c = x.shape
    fz, fy, fx = f
    if d % fz or h % fy or w % fx:
        raise ValueError(
            f"space-to-depth fold {f} needs divisible spatial dims, "
            f"got {(d, h, w)}")
    x = x.reshape(n, d // fz, fz, h // fy, fy, w // fx, fx, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(n, d // fz, h // fy, w // fx, fz * fy * fx * c)


def unfold3(x, f):
    """Inverse of :func:`fold3`."""
    n, p, q, r, cf = x.shape
    fz, fy, fx = f
    c = cf // (fz * fy * fx)
    x = x.reshape(n, p, q, r, fz, fy, fx, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(n, p * fz, q * fy, r * fx, c)


def folded_k(k: int, f: int) -> int:
    """Folded tap count for a k-tap axis at fold factor f: the original
    offsets t - k//2 in [-(k//2), k//2] land in folded-pixel offsets
    floor((e + t - k//2)/f) in [-ceil((k//2)/f), ceil((k//2)/f)] — a
    TRIMMED symmetric window (k=5, f=2 -> 3 folded taps, not 5; an
    untrimmed kernel would spend 4.6x redundant FLOPs on zero planes).
    """
    if f == 1:
        return k
    half = k // 2
    return 2 * (-(-half // f)) + 1


@functools.lru_cache(maxsize=None)
def _axis_selector(k: int, f: int):
    """Constant 0/1 selector A[t, T, d, e]: original tap t scatters to
    folded tap T (of the TRIMMED folded_k(k, f) window) between input
    subpixel d and output subpixel e (s2d._selector, one axis).
    f=1 -> identity."""
    kf = folded_k(k, f)
    a = np.zeros((k, kf, f, f), np.float32)
    if f == 1:
        for t in range(k):
            a[t, t, 0, 0] = 1.0
        return a
    half, fhalf = k // 2, kf // 2
    for e in range(f):
        for t in range(k):
            big_t, d = divmod(e + t - half, f)
            a[t, big_t + fhalf, d, e] = 1.0
    return a


def folded_kernel_shape3(k, in_groups, co, f):
    p = prodf(f)
    kz, ky, kx = (folded_k(k, a) for a in f)
    return (kz, ky, kx, p * sum(in_groups), p * co)


def fold_conv_kernel3(w, in_groups, f):
    """Build the folded kernel from an original (k, k, k, Ci, Co) kernel.

    in_groups: original channel counts of the folded input's
    concatenated sources; sum(in_groups) == Ci.
    """
    kz, ky, kx, ci, co = w.shape
    assert sum(in_groups) == ci, (in_groups, ci)
    fz, fy, fx = f
    p = prodf(f)
    sz = jnp.asarray(_axis_selector(kz, fz), w.dtype)
    sy = jnp.asarray(_axis_selector(ky, fy), w.dtype)
    sx = jnp.asarray(_axis_selector(kx, fx), w.dtype)
    fkz, fky, fkx = (folded_k(k, a) for k, a in zip((kz, ky, kx), f))
    parts, off = [], 0
    for g in in_groups:
        wf = jnp.einsum("zZde,yYfg,xXhi,zyxmn->ZYXdfhmegin",
                        sz, sy, sx, w[:, :, :, off:off + g, :],
                        precision=jax.lax.Precision.HIGHEST)
        parts.append(wf.reshape(fkz, fky, fkx, p * g, p * co))
        off += g
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=3)


def unfold_wgrad3(gf, k, in_groups, co, f, dtype=None):
    """Map a folded-kernel gradient back to the original kernel (each
    original tap accumulates its subpixel slots)."""
    fz, fy, fx = f
    p = prodf(f)
    sz = jnp.asarray(_axis_selector(k, fz), gf.dtype)
    sy = jnp.asarray(_axis_selector(k, fy), gf.dtype)
    sx = jnp.asarray(_axis_selector(k, fx), gf.dtype)
    fkz, fky, fkx = (folded_k(k, a) for a in (fz, fy, fx))
    parts, off = [], 0
    for g in in_groups:
        gf_g = gf[:, :, :, off:off + p * g, :].reshape(
            fkz, fky, fkx, fz, fy, fx, g, fz, fy, fx, co)
        parts.append(jnp.einsum(
            "zZde,yYfg,xXhi,ZYXdfhmegin->zyxmn", sz, sy, sx, gf_g,
            precision=jax.lax.Precision.HIGHEST))
        off += p * g
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=3)
    return out.astype(dtype) if dtype else out


def fold_bias3(b, f):
    """Original per-Co bias -> folded prod(f)·Co bias (subpixel-major)."""
    return jnp.tile(b, prodf(f))


def transpose_kernel_matrix(w, f):
    """k=2/s=2 transpose conv emitting a FOLDED output: taps never
    overlap, so y_folded[p, ((ez,ey,ex), o)] = x[p] @ w[ez,ey,ex,:,o].
    Requires f == kernel size per axis (full fold).  Returns the
    (Ci, prod(f)·Co) matrix for a 1x1x1 conv / einsum apply."""
    kz, ky, kx, ci, co = w.shape
    assert (kz, ky, kx) == tuple(f), ((kz, ky, kx), f)
    return jnp.moveaxis(w, 3, 0).reshape(ci, kz * ky * kx * co)


def fold_transpose_kernel3(w, f):
    """k=2/s=2 transpose conv whose output is FOLDED on the f==2 axes:
    those axes' taps never overlap, so each absorbs into the output
    channel block; axes with f==1 keep their k=2/s=2 structure.

    Returns (w', strides'): w' has kernel dims (1 if f==2 else 2) and
    prod(f)·Co output channels in fold3's subpixel-major order, so
    ``rules.conv_transpose_fwd(x, w', strides')`` emits the folded
    output directly (and takes the k==s matmul fast path)."""
    kz, ky, kx, ci, co = w.shape
    assert (kz, ky, kx) == (2, 2, 2), (kz, ky, kx)
    kept = [ax for ax in range(3) if f[ax] == 1]
    absorbed = [ax for ax in range(3) if f[ax] == 2]
    perm = kept + [3] + absorbed + [4]
    wt = jnp.transpose(w, perm)
    pf = prodf(f)
    shape = tuple(1 if f[ax] == 2 else 2 for ax in range(3)) \
        + (ci, pf * co)
    strides = tuple(1 if f[ax] == 2 else 2 for ax in range(3))
    return wt.reshape(shape), strides


def folded_pad3(k, f):
    """Same-pad config for the TRIMMED folded kernel: folded_k//2 per
    axis (k=5 f=2 -> pad 1 on the folded grid; f=1 -> k//2)."""
    return tuple((folded_k(k, a) // 2,) * 2 for a in f)


def fold_down_kernel3(w, f):
    """k=2/s=2 strided conv CONSUMING a folded input (VNet
    DownTransition, vnet.py:85-104): on f==2 axes both taps live inside
    ONE folded pixel — they become input-channel subpixel blocks — so
    with full (2,2,2) folding the op is a dense (8·Ci, Co) matmul at
    the output resolution (1x FLOPs, ideal MXU shape).  f==1 axes keep
    their k=2/s=2 structure.  Returns (w', strides') for
    ``rules.conv_fwd(x_folded, w', strides')``; the output is UNFOLDED
    (it lives at the strided resolution)."""
    kz, ky, kx, ci, co = w.shape
    assert (kz, ky, kx) == (2, 2, 2), (kz, ky, kx)
    # only fold factors 1 and 2 are representable below; anything else
    # would silently produce a wrong kernel/strides pair
    assert all(a in (1, 2) for a in f), f
    # reshape each kernel axis into (spatial_tap, subpixel): f==2 axes
    # contribute (1, 2), f==1 axes (2, 1); then group (dz, dy, dx) into
    # the input-channel block in fold3's subpixel-major order.
    shp = []
    for a in range(3):
        shp += ([1, 2] if f[a] == 2 else [2, 1])
    wt = w.reshape(tuple(shp) + (ci, co))
    wt = jnp.transpose(wt, (0, 2, 4, 1, 3, 5, 6, 7))
    sz, sy, sx = (1 if f[a] == 2 else 2 for a in range(3))
    pf = prodf(tuple(2 if f[a] == 2 else 1 for a in range(3)))
    strides = tuple(1 if f[a] == 2 else 2 for a in range(3))
    return wt.reshape(sz, sy, sx, pf * ci, co), strides


def group_out_perm(co, out_groups, f):
    """Index array permuting a folded conv's OUTPUT channel axis from
    standard subpixel-major order (d*Co + c) into grouped-concat order
    ([(d, c in g0) | (d, c in g1) | ...]) — the layout of a folded
    concat.  Applying this to the folded KERNEL (and folded bias) is
    free at trace time and lets a residual add against a folded concat
    skip the :func:`regroup3` activation permute entirely (measured
    3.8 ms backward split on the VNet up_tr32 level)."""
    assert sum(out_groups) == co, (out_groups, co)
    pf = prodf(f)
    perm, c0 = [], 0
    for g in out_groups:
        for d in range(pf):
            for c in range(g):
                perm.append(d * co + c0 + c)
        c0 += g
    return np.asarray(perm, np.int32)


def regroup3(x, groups, f):
    """Grouped folded concat -> STANDARD folded channel order.

    A concat of folded tensors keeps per-source subpixel blocks
    ((d, c_g) per group); convs consume that via ``in_groups``, but
    elementwise ops against a standard-order folded tensor (VNet's
    residual adds) need ((d), (c over all groups)).  Static block
    transpose — no gather."""
    pf = prodf(f)
    parts, off = [], 0
    for g in groups:
        parts.append(x[..., off:off + pf * g].reshape(
            x.shape[:-1] + (pf, g)))
        off += pf * g
    y = jnp.concatenate(parts, axis=-1)
    return y.reshape(x.shape[:-1] + (pf * sum(groups),))


def subpixel_max3(x, f):
    """2x2x2/stride-2 maxpool of the ORIGINAL tensor computed on the
    folded tensor; the result is the UNFOLDED half-resolution output.
    Axes with f==2 reduce over their subpixel block; axes with f==1
    reduce over adjacent spatial pairs.

    The backward is a custom vjp replicating lax.reduce_window's
    select-and-scatter EXACTLY: the cotangent routes to the FIRST
    window element (in (z, y, x) row-major order) achieving the max —
    post-relu zero ties make the default chained-jnp.max subgradient
    differ from the unfolded model's (tests/test_unet3d_s2d.py)."""
    return _spmax(tuple(int(a) for a in f), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmax(f, x):
    n, p, q, r, cf = x.shape
    fz, fy, fx = f
    c = cf // (fz * fy * fx)
    y = jnp.max(x.reshape(n, p, q, r, fz * fy * fx, c), axis=4)
    if fz == 1:
        y = jnp.max(y.reshape(n, p // 2, 2, q, r, c), axis=2)
        p //= 2
    if fy == 1:
        y = jnp.max(y.reshape(n, p, q // 2, 2, r, c), axis=3)
        q //= 2
    if fx == 1:
        y = jnp.max(y.reshape(n, p, q, r // 2, 2, c), axis=4)
    return y


def _spmax_fwd(f, x):
    return _spmax(f, x), x


def _spmax_bwd(f, x, g):
    xu = unfold3(x, f)
    n, d, h, w, c = xu.shape
    ew = xu.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c)
    ew = jnp.transpose(ew, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
        n, d // 2, h // 2, w // 2, 8, c)
    m = ew == jnp.max(ew, axis=4, keepdims=True)
    first = jnp.logical_and(m, jnp.cumsum(m.astype(jnp.int32),
                                          axis=4) == 1)
    gx = jnp.where(first, g[..., None, :], 0).astype(x.dtype)
    gx = gx.reshape(n, d // 2, h // 2, w // 2, 2, 2, 2, c)
    gx = jnp.transpose(gx, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
        n, d, h, w, c)
    return (fold3(gx, f),)


_spmax.defvjp(_spmax_fwd, _spmax_bwd)


__all__ = ["fold3", "unfold3", "folded_k", "fold_conv_kernel3", "unfold_wgrad3",
           "fold_bias3", "subpixel_max3", "prodf",
           "folded_kernel_shape3", "transpose_kernel_matrix",
           "folded_pad3", "fold_down_kernel3", "regroup3"]
