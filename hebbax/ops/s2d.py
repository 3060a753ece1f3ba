"""Space-to-depth folding for small-channel high-resolution convs.

The UNet family's top levels (C = 16..64 at 64²..128²) are the TPU's
worst case: channels land on the 128-wide MXU/VPU lane axis and pad up
to 8x, so a 3x3 16→16 conv at 128² runs ~50x off peak (measured — see
CLAUDE.md roofline notes).  Folding 2x2 spatial blocks into channels
(NHWC (N,H,W,C) → (N,H/2,W/2,4C)) makes the same math MXU-shaped.

A 3x3 stride-1 conv on the original tensor is EXACTLY a 3x3 stride-1
conv on the folded tensor with a structured (4Ci, 4Co) block kernel
holding the original 9·Ci·Co weights in 36 of its 144 (tap, block)
slots and zeros elsewhere (4x the FLOPs, ≥4x the MXU efficiency, ~1/4
the relayout traffic).  The mapping, for output subpixel (ey, ex) and
original tap (u, v) ∈ {-1,0,1}²:

    original input row 2P+ey+u = 2(P+U)+dy  with  U = floor((ey+u)/2),
    dy = (ey+u) mod 2  (same for columns), so

    W'[U+1, V+1, (dy,dx,i), (ey,ex,o)] = W[u+1, v+1, i, o].

Folded channel order is (dy*2+dx)*C + c.  Concatenations of folded
tensors keep per-source blocks, handled by ``in_groups``.

The 2x2/stride-2 maxpool becomes a max over the 4 subpixel blocks of
each folded pixel — its output IS the unfolded half-resolution tensor,
so pooling doubles as the unfold at level transitions.

Used by models/unet2d_s2d.py (UNet2DS2D) and hebb/layers.py
(FoldedHConv).  Everything here is exact in f32 — verified against the
unfolded model in tests/test_s2d.py.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp


def fold(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel order (dy*2+dx)*C+c."""
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(
            f"space-to-depth folding needs even spatial dims, got "
            f"{(h, w)}; the s2d model variants (unet_s2d / unet_urpc_s2d "
            f"/ unet_cct_s2d) require H, W % 4 == 0 — use the unfolded "
            f"network for odd-sized inputs")
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // 2, w // 2, 4 * c)


def unfold(x):
    """Inverse of :func:`fold`."""
    n, p, q, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, p, q, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, 2 * p, 2 * q, c)


@functools.lru_cache(maxsize=None)
def _fold_maps(k: int):
    """Static (U, dy, u) index triples for a k-tap axis (k in {1, 3}).

    Returns a list over (e, t) of (folded_tap, subpixel, original_tap)
    with taps 0-based (original tap t corresponds to offset t - k//2)."""
    half = k // 2
    out = []
    for e in (0, 1):
        for t in range(k):
            s = e + t - half          # original offset from 2P
            fu, dy = divmod(s, 2)     # floor-div handles negatives
            out.append((fu + half, dy, t, e))
    return out


def folded_kernel_shape(k, in_groups, co):
    ci4 = 4 * sum(in_groups)
    return (k, k, ci4, 4 * co)


@functools.lru_cache(maxsize=None)
def _selector(k: int):
    """Constant 0/1 selector S[tu, tv, U, V, dyx, eyx]: original tap
    (tu, tv) scatters to folded tap (U, V) between input subpixel block
    dyx and output subpixel block eyx.  One einsum against S builds the
    folded kernel (and its transpose gathers wgrads back) — no
    dynamic-update-slice chains in the compiled program."""
    s = np.zeros((k, k, k, k, 4, 4), np.float32)
    for fu, dy, tu, ey in _fold_maps(k):
        for fv, dx, tv, ex in _fold_maps(k):
            s[tu, tv, fu, fv, dy * 2 + dx, ey * 2 + ex] = 1.0
    return s


def fold_conv_kernel(w, in_groups):
    """Build the folded kernel W' from an original (k, k, Ci, Co) kernel.

    in_groups: original channel counts of the folded input's sources
    (a folded concat keeps each source's 4 subpixel blocks contiguous).
    sum(in_groups) must equal Ci.
    """
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    assert sum(in_groups) == ci, (in_groups, ci)
    sel = jnp.asarray(_selector(k), w.dtype)
    parts, off = [], 0
    for g in in_groups:
        # (k,k,U,V,d,e) x (k,k,g,Co) -> (U,V,d,g,e,Co) -> (k,k,4g,4Co)
        wf_g = jnp.einsum("uvUVde,uvio->UVdieo", sel,
                          w[:, :, off:off + g, :],
                          precision=jax.lax.Precision.HIGHEST)
        parts.append(wf_g.reshape(k, k, 4 * g, 4 * co))
        off += g
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)


def unfold_wgrad(gf, k, in_groups, co, dtype=None):
    """Map a folded-kernel gradient back to the original kernel: each
    original tap (u, v, i, o) accumulates its 4 subpixel slots."""
    sel = jnp.asarray(_selector(k), gf.dtype)
    outs, off_fold, parts = None, 0, []
    for g in in_groups:
        gf_g = gf[:, :, off_fold:off_fold + 4 * g, :].reshape(
            k, k, 4, g, 4, co)
        parts.append(jnp.einsum("uvUVde,UVdieo->uvio", sel, gf_g,
                                precision=jax.lax.Precision.HIGHEST))
        off_fold += 4 * g
    out = (parts[0] if len(parts) == 1
           else jnp.concatenate(parts, axis=2))
    return out.astype(dtype) if dtype else out


def fold_bias(b):
    """Original per-Co bias -> folded 4Co bias ((ey,ex) major)."""
    return jnp.tile(b, 4)


def subpixel_max(x):
    """2x2/stride-2 maxpool of the original tensor, computed on the
    folded tensor; the result is the UNFOLDED half-resolution output."""
    n, p, q, c4 = x.shape
    return jnp.max(x.reshape(n, p, q, 4, c4 // 4), axis=3)


def per_subpixel(fn, x, co=None):
    """Apply fn over the original-channel axis of a folded tensor (e.g.
    softmax over classes within each subpixel block)."""
    n, p, q, c4 = x.shape
    c = c4 // 4 if co is None else co
    y = fn(x.reshape(n, p, q, 4, c))
    return y.reshape(n, p, q, 4 * c)


def fold_resize_linear_align_corners(x, out_spatial):
    """resize_linear_align_corners on an UNFOLDED input, emitting the
    FOLDED result directly (fold of the resized tensor)."""
    from ..models.common import resize_linear_align_corners
    return fold(resize_linear_align_corners(x, out_spatial))


# numpy is only used for static assertions in tests
__all__ = ["fold", "unfold", "fold_conv_kernel", "unfold_wgrad",
           "fold_bias", "subpixel_max", "per_subpixel",
           "folded_kernel_shape", "fold_resize_linear_align_corners"]
