"""Functional Hebbian plasticity rules (rank-generic: 2D and 3D).

Math contract replicated from the reference layers
(/root/reference/hebb/hebb.py:93-172,234-277 and hebb/hebb3d.py), with a
TPU-first formulation:

* Every "r times unfolded-input" correlation is expressed as the
  weight-gradient of the layer's own (transpose-)convolution, obtained with
  ``jax.vjp``.  XLA lowers these to MXU weight-grad convs — no materialized
  ``F.unfold`` tensors, and the reference's 32-channel chunk workaround for
  3D (hebb3d.py:7,117-125) becomes unnecessary.
* Unfold *sums* (the swta_t decay statistics) reuse the same trick with an
  all-ones single-channel input.
* Decay terms are small ``(O,O)`` / ``(k..,O)`` einsums.

Rules (patchwise=True, the only branch the reference exercises — its
non-patchwise swta branch is shape-inconsistent dead code):

  swta   : r = softmax(k*y);   dw = <r, x_patches> - (sum r) * w
  hpca   : Sanger;             dw = <y, x_patches> - tril(y y^T) @ w
  swta_t : transpose-conv swta over unfolded outputs
  hpca_t : transpose-conv Sanger over unfolded outputs
  contrastive: gradient of a local InfoNCE-like neighborhood objective.

Conventions: channels-last activations (N, *spatial, C); kernels stored
``(*k, I, O)`` where I always matches the layer *input* channels (for both
conv and transpose conv).  ``x`` is the manually padded layer input; ``y``
the pre-activation output.
"""

import functools
import operator
import os

import jax
import jax.numpy as jnp
from jax import lax


def delta_compute_dtype():
    """Dtype for Hebbian delta computation.  f32 by default (torch
    parity); HEBBAX_DELTA_DTYPE=bfloat16 trades ~1e-2 relative delta
    error for roughly half the HBM traffic on the update path."""
    return jnp.dtype(os.environ.get("HEBBAX_DELTA_DTYPE", "float32"))


def _specs(nd):
    sp = "DHW"[3 - nd:]
    return "N" + sp + "C", sp + "IO", "N" + sp + "C"


def _conv_fwd_raw(x, w, strides, padding=None):
    nd = x.ndim - 2
    return lax.conv_general_dilated(
        x, w, window_strides=strides,
        padding="VALID" if padding is None else list(padding),
        dimension_numbers=_specs(nd))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_fwd(x, w, strides, padding=None):
    """Cross-correlation, channels-last.  padding=None means VALID on a
    pre-padded x (the torch-parity test convention); otherwise a
    per-spatial-dim ((lo, hi), ...) config applied NATIVELY by XLA — no
    materialized padded copy (the jnp.pad+VALID pattern costs a full
    activation relayout per conv on TPU).

    custom_vjp: the data gradient is XLA's usual transposed conv, but
    the WEIGHT gradient routes through :func:`wgrad_fwd`, which picks
    the shifted-slices matmul formulation for small-channel sites
    (measured 1.4-1.7x on the C<=16 128^2 sites) — this covers every
    backprop dW in the model zoo, not just the Hebbian deltas.

    NOTE: jax.custom_vjp makes this (and therefore every conv in the
    model zoo) reverse-mode-only — jax.jvp/linearize/hessian through a
    model forward will raise.  Nothing in-repo uses forward-mode AD."""
    return _conv_fwd_raw(x, w, strides, padding)


def _conv_fwd_vjp_fwd(x, w, strides, padding=None):
    return _conv_fwd_raw(x, w, strides, padding), (x, w)


def _conv_fwd_vjp_bwd(strides, padding, res, g):
    x, w = res
    _, vjp_x = jax.vjp(
        lambda x_: _conv_fwd_raw(x_, w, strides, padding), x)
    dw = wgrad_fwd(x, w.shape, g, strides, padding)
    return vjp_x(g)[0], dw


conv_fwd.defvjp(_conv_fwd_vjp_fwd, _conv_fwd_vjp_bwd)


def conv_transpose_fwd(x, w, strides):
    """Transpose convolution with the adjoint-of-conv (PyTorch) kernel
    orientation: y[p] = sum_q x[q] * w[p - s*q]; output (i-1)*s + k.

    k == strides fast path (every transpose site in the model zoo is
    k=2, s=2): taps never overlap, so y[s*q + e] = x[q] @ w[e] — one
    dense (I, prod(k)*O) matmul plus a depth-to-space reshape.  The
    generic lhs-dilated conv makes the MXU multiply mostly-zero dilated
    input (7/8 zero taps for k=s=2 in 3D); the matmul form does the
    same math at 1x FLOPs and its vjp (the Hebbian _wgrad path) is a
    matmul too."""
    nd = x.ndim - 2
    k = w.shape[:nd]
    if tuple(k) == tuple(strides):
        i, o = w.shape[nd], w.shape[nd + 1]
        kp = functools.reduce(operator.mul, k, 1)
        # (*k, I, O) -> (I, prod(k)*O), tap-major channel blocks
        wm = jnp.moveaxis(w, nd, 0).reshape(i, kp * o)
        y = jnp.einsum("...i,ie->...e", x, wm)
        # depth-to-space: (N, *P, (e, o)) -> (N, *(k*P), O)
        n, sp = y.shape[0], y.shape[1:-1]
        y = y.reshape((n,) + sp + tuple(k) + (o,))
        perm = [0]
        for ax in range(nd):
            perm += [1 + ax, 1 + nd + ax]
        y = jnp.transpose(y, perm + [1 + 2 * nd])
        return y.reshape((n,) + tuple(s * ki for s, ki in
                                      zip(sp, k)) + (o,))
    w_flip = w[tuple(slice(None, None, -1) for _ in range(nd))]
    return lax.conv_general_dilated(
        x, w_flip, window_strides=(1,) * nd,
        padding=[(ki - 1, ki - 1) for ki in k],
        lhs_dilation=strides,
        dimension_numbers=_specs(nd))


def _wgrad(fwd, x, w_shape, cotangent, strides, padding=None):
    """d/dw <fwd(x, w), cotangent> — the unfold correlation, as a
    weight-gradient conv.  fwd is linear in w, so the primal value of w
    is irrelevant; zeros are used."""
    zero_w = jnp.zeros(w_shape, x.dtype)
    if padding is None:
        _, vjp = jax.vjp(lambda w_: fwd(x, w_, strides), zero_w)
    else:
        _, vjp = jax.vjp(lambda w_: fwd(x, w_, strides, padding), zero_w)
    return vjp(cotangent)[0]


def _shifts_profitable(w_shape, strides, padding):
    """Whether to compute this site's weight gradient as per-tap
    shifted-slices matmuls instead of XLA's wgrad conv.

    MEASURED NEGATIVE — off by default.  Isolated (one delta per scan
    step, scripts/microbench_wgrad.py, f32 bs=32) the shifts form wins
    at small channels: 16->16 @128^2 1.51 -> 0.88 ms, 32->2 @128^2
    1.91 -> 1.10 ms (crossover min(Ci,Co) <= 16).  END-TO-END it LOSES:
    with min<=16 sites routed to shifts, the sup fast-path step went
    14.3 -> 19.3 ms and the swta_t pretrain step 16.3 -> 21.4 ms — in
    the full program the wgrad convs overlap other work, while the
    shifts form adds a materialized jnp.pad copy and 9 strided re-reads
    of x that contend for the same HBM.  Opt in per-process with
    HEBBAX_WGRAD=shifts (2D stride-1 symmetric-padding sites only)."""
    if os.environ.get("HEBBAX_WGRAD") != "shifts":
        return False
    nd = len(w_shape) - 2
    return (nd == 2 and tuple(strides) == (1, 1)
            and (padding is None
                 or all(lo == hi for lo, hi in padding)))


def _wgrad_conv_shifts(x, w_shape, cotangent, padding):
    """Stride-1 2D weight gradient as prod(k) per-tap (Ci, Co) matmuls
    over N*H*W — exact same unfold correlation as the wgrad conv, but
    the MXU contracts the long pixel axis instead of lane-padding the
    small channel axes."""
    kh, kw, ci, co = w_shape
    if padding is not None:
        ph, pw = padding[0][0], padding[1][0]
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    h, w = cotangent.shape[1], cotangent.shape[2]
    rows = []
    for u in range(kh):
        row = []
        for v in range(kw):
            xs = jax.lax.slice(
                x, (0, u, v, 0),
                (x.shape[0], u + h, v + w, x.shape[3]))
            row.append(jnp.einsum("nhwi,nhwo->io", xs, cotangent))
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def wgrad_fwd(x, w_shape, cotangent, strides, padding=None):
    """Forward-conv weight gradient with the TPU-measured formulation
    choice (see _shifts_profitable).  Falls back to the RAW conv wgrad
    (not conv_fwd — whose custom_vjp routes back here)."""
    if _shifts_profitable(w_shape, strides, padding):
        return _wgrad_conv_shifts(x, w_shape, cotangent, padding)
    return _wgrad(_conv_fwd_raw, x, w_shape, cotangent, strides, padding)


def normalize(x, axis):
    """L2-normalize with zero-norm guard (reference hebb.py:10-13)."""
    nrm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    nrm = jnp.where(nrm == 0, 1.0, nrm)
    return x / nrm


def weight_norm_axes(nd, transpose):
    """Per-filter normalization axes for a (*k, I, O) kernel.

    Forward convs normalize each output filter (over spatial + I); the
    reference's transpose layers inherit ``normalize(w, dim=(1,2,3))`` on a
    (I, O, *k) tensor, i.e. per *input* channel (over spatial + O)."""
    if transpose:
        return tuple(range(nd)) + (nd + 1,)
    return tuple(range(nd)) + (nd,)


# ---------------------------------------------------------------------------
# Forward-conv rules (hebb.py:102-141); also used for swta/hpca on transpose
# layers with x and y swapped and the kernel I/O axes transposed
# (hebb.py:243-246).
# ---------------------------------------------------------------------------

def swta_conv_delta(w, x, y, k, strides, padding=None):
    """dw = <softmax(k y), x_patches> - (sum softmax) * w."""
    x = lax.stop_gradient(x)
    y = lax.stop_gradient(y)
    r = jax.nn.softmax(k * y, axis=-1)
    pos = wgrad_fwd(x, w.shape, r, strides, padding)
    r_sum = jnp.sum(r, axis=tuple(range(r.ndim - 1)))  # (O,)
    return pos - r_sum * w


def _sanger_tril(o, dtype, chunk=None):
    """Lower-triangular (incl. diagonal) lateral-competition mask.

    chunk: the reference's 3D TRANSPOSE layer chunks its weight's dim 1 —
    which is the OUTPUT channel axis there — in PARALLEL_CHANNELS=32
    pieces and builds the tril over LOCAL chunk indices
    (hebb3d.py:7,295-306), so the lateral ordering resets every 32
    channels (block-diagonal tril).  A GPU-memory knob that changes the
    math; replicated exactly for parity.  The 3D CONV layer chunks dim 1
    too, but there it is the INPUT axis and its tril spans all outputs
    (hebb3d.py:144-154) -> chunk=None, as for the unchunked 2D layers."""
    tril = jnp.tril(jnp.ones((o, o), dtype))
    if chunk:
        idx = jnp.arange(o) // chunk
        tril = tril * (idx[:, None] == idx[None, :]).astype(dtype)
    return tril


def hpca_conv_delta(w, x, y, strides, chunk=None, padding=None):
    """Sanger's rule: dw = <y, x_patches> - tril(y y^T) @ w."""
    x = lax.stop_gradient(x)
    y = lax.stop_gradient(y)
    pos = wgrad_fwd(x, w.shape, y, strides, padding)
    yf = y.reshape(-1, y.shape[-1])
    m = yf.T @ yf                                     # (O, O)
    dec = jnp.einsum("ab,...b->...a",
                     m * _sanger_tril(m.shape[0], w.dtype, chunk), w)
    return pos - dec


# ---------------------------------------------------------------------------
# Transpose-conv rules (hebb.py:252-277): operate on the *output* map
# unfolded with (kernel, stride); patch q of the unfold aligns with input
# pixel q, element kappa of a patch is y[s*q + kappa].
# ---------------------------------------------------------------------------

def _unfold_sum(y, x_shape, k, strides):
    """sum_{n,q} y[n, s*q + kappa, o] for each kernel offset kappa,
    via a weight-grad conv against an all-ones 1-channel input.
    Returns (*k, O)."""
    nd = y.ndim - 2
    ones = jnp.ones(x_shape[:-1] + (1,), y.dtype)
    g = _wgrad(conv_transpose_fwd, ones, k + (1, y.shape[-1]), y, strides)
    return g[..., 0, :]


def _strided_patches_m(y, x_shape, k, strides):
    """Per-kernel-offset output Gram matrices M[kappa][o,o'] =
    sum_{n,q} y[n, s q + kappa, o] y[n, s q + kappa, o'] using strided
    slices of y (no materialized unfold).  Returns (prod(k), O, O) plus
    the static list of offsets."""
    import itertools

    nd = y.ndim - 2
    in_spatial = x_shape[1:-1]
    mats = []
    for kappa in itertools.product(*[range(ki) for ki in k]):
        idx = (slice(None),) + tuple(
            slice(kappa[d], kappa[d] + strides[d] * in_spatial[d], strides[d])
            for d in range(nd)) + (slice(None),)
        y_k = y[idx]
        yf = y_k.reshape(-1, y.shape[-1])
        mats.append(yf.T @ yf)
    return jnp.stack(mats)  # (prod(k), O, O)


def swta_t_delta(w, x, y, k_temp, strides):
    """Transpose-conv SWTA: r = softmax(k y) over channels of the (larger)
    output map; dw = <r_unfold, x> - (sum_kappa sum r_unfold) * w."""
    x = lax.stop_gradient(x)
    y = lax.stop_gradient(y)
    nd = x.ndim - 2
    k = w.shape[:nd]
    r = jax.nn.softmax(k_temp * y, axis=-1)
    pos = _wgrad(conv_transpose_fwd, x, w.shape, r, strides)
    r_sum = _unfold_sum(r, x.shape, k, strides)        # (*k, O)
    # patchwise: decay summed over kernel offsets, broadcast back
    dec = jnp.sum(r_sum[..., None, :] * w,
                  axis=tuple(range(nd)), keepdims=True)
    return pos - dec


def hpca_t_delta(w, x, y, strides, chunk=None):
    """Transpose-conv Sanger: per-offset Gram of the unfolded output.

    chunk: see _sanger_tril — hebb3d's chunked unfold block-diagonalizes
    the tril in the 3D reference."""
    x = lax.stop_gradient(x)
    y = lax.stop_gradient(y)
    nd = x.ndim - 2
    k = w.shape[:nd]
    pos = _wgrad(conv_transpose_fwd, x, w.shape, y, strides)
    m = _strided_patches_m(y, x.shape, k, strides)     # (K, O, O)
    tril = _sanger_tril(m.shape[-1], w.dtype, chunk)
    w_k = w.reshape((-1,) + w.shape[nd:])              # (K, I, O)
    # patchwise: dec[i,o] = sum_kappa sum_{o'<=o} M_k[o,o'] w[kappa,i,o']
    dec = jnp.einsum("kab,kib->ia", m * tril, w_k)
    return pos - dec.reshape((1,) * nd + dec.shape)


# ---------------------------------------------------------------------------
# Contrastive rule (hebb.py:143-172): gradient of a local neighborhood
# objective; positives = own 3x3 neighborhood, negatives = the same
# neighborhood from a batch-shuffled image.
# ---------------------------------------------------------------------------

def _neighborhood_sum(y):
    """Sum over the 3^nd neighborhood (SAME padding, zeros)."""
    nd = y.ndim - 2
    window = (1,) + (3,) * nd + (1,)
    return lax.reduce_window(y, 0.0, lax.add, window, (1,) * (nd + 2),
                             "SAME")


def contrastive_delta(w, x, key, strides, transpose, w_nrm, contrast=1.0,
                      uniformity=False, bias=None, padding=None):
    """dw = d/dw sum[-nbr(y) . y + contrast * nbr(y)[perm] . y], where
    y = fwd(x, normalize(w)) is L2-normalized over channels and perm
    shuffles the batch.  Note the sign: the reference *adds* this gradient
    to delta_w and local_update negates it, producing ascent on the
    objective — replicated exactly.

    padding: native conv padding (forward convs only).  Identical math to
    the pre-padded x + VALID convention: padded zeros L2-normalize to
    zero, so their umap/objective contributions vanish either way."""
    x = lax.stop_gradient(x)
    nd = x.ndim - 2
    if transpose:
        def fwd(x_, w_, s_):
            return conv_transpose_fwd(x_, w_, s_)
    else:
        def fwd(x_, w_, s_):
            return conv_fwd(x_, w_, s_, padding)
    perm = jax.random.permutation(key, x.shape[0])

    def objective(w_):
        w_eff = (normalize(w_, axis=weight_norm_axes(nd, transpose))
                 if w_nrm else w_)
        y = fwd(x, w_eff, strides)
        if bias is not None:
            y = y + bias
        y = normalize(y, axis=-1)
        nbr = _neighborhood_sum(y)
        l = -jnp.sum(nbr * y, axis=-1) + contrast * jnp.sum(
            nbr[perm] * y, axis=-1)
        if uniformity:
            xn = normalize(x, axis=-1)
            umap = jnp.sum(_neighborhood_sum(xn) * xn, axis=-1,
                           keepdims=True)
            ones_k = jnp.ones(w.shape[:nd] + (1, 1), x.dtype)
            umap = fwd(umap, ones_k, strides)[..., 0]
            l = l * lax.stop_gradient(umap)
        return jnp.sum(l)

    return jax.grad(objective)(w)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def compute_delta(spec, w, x, y, strides, transpose, key=None, bias=None,
                  padding=None):
    """Route to the configured rule.  For transpose layers with a non-_t
    mode, the conv rule runs with x<->y swapped and the kernel I/O axes
    transposed (hebb.py:243-246).

    padding: native conv padding for forward-conv rules (None = x is
    pre-padded, the torch-parity test convention).  Transpose layers
    never pad in the model zoo, so the _t rules don't take it."""
    if not spec.patchwise:
        raise NotImplementedError(
            "patchwise=False is dead code in the reference (shape-"
            "inconsistent) and is not supported")
    mode = spec.conv_mode(transpose)
    nd = x.ndim - 2
    if mode == "contrastive":
        return contrastive_delta(w, x, key, strides, transpose, spec.w_nrm,
                                 spec.contrast, spec.uniformity, bias,
                                 padding=None if transpose else padding)
    if transpose and mode in ("swta", "hpca"):
        w_sw = jnp.swapaxes(w, nd, nd + 1)
        if mode == "swta":
            from .pallas_kernels import swta_delta
            d = swta_delta(w_sw, y, x, spec.k, strides)
        else:
            d = hpca_conv_delta(w_sw, y, x, strides)
        return jnp.swapaxes(d, nd, nd + 1)
    if mode == "swta":
        if transpose:
            raise AssertionError  # handled above
        # fused Pallas kernel on TPU for 2D stride-1 (the hot path);
        # XLA-composed rule otherwise
        from .pallas_kernels import swta_delta
        return swta_delta(w, x, y, spec.k, strides, padding=padding)
    if mode == "hpca":
        return hpca_conv_delta(w, x, y, strides, padding=padding)
    if mode == "swta_t":
        if not transpose:
            raise ValueError("swta_t only applies to transpose convs")
        return swta_t_delta(w, x, y, spec.k, strides)
    if mode == "hpca_t":
        if not transpose:
            raise ValueError("hpca_t only applies to transpose convs")
        # 3D: hebb3d's chunked unfold block-diagonalizes the Sanger tril
        return hpca_t_delta(w, x, y, strides,
                            chunk=32 if nd == 3 else None)
    raise NotImplementedError(f"Hebbian mode {mode!r} unavailable")
