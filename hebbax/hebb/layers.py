"""Flax convolution modules with optional Hebbian plasticity.

TPU-native replacement for the reference's module surgery
(/root/reference/hebb/makehebbian.py, hebb/hebb.py:16-91): every conv site
in every hebbax model is an :class:`HConv` / :class:`HConvTranspose`.  When
a :class:`~hebbax.hebb.spec.HebbSpec` is attached and the layer's path is
not excluded, the layer

  * L2-normalizes its kernel per filter before applying it (``w_nrm``),
  * computes the configured plasticity delta during a training forward
    pass and sows it into the ``hebb`` collection (replacing the
    reference's ``delta_w`` buffer + ``local_update()`` ordering protocol),
  * keeps identical parameter shapes to the plain variant, so pretrain ->
    fine-tune checkpoints load without structural surgery.

Conventions: channels-last inputs, kernels ``(*k, I, O)``, manual
symmetric padding then VALID convolution (reference pads explicitly,
hebb.py:83-85).
"""

import math
import os
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from jax.ad_checkpoint import checkpoint_name

from . import rules
from .spec import HebbSpec, spec_if_active

# Conv outputs are tagged so rematted regions can opt into the
# ``save_only_these_names("hconv_out")`` checkpoint policy: backward
# then recomputes only the cheap elementwise tail (BN/ReLU/concat)
# while every conv result — the expensive MXU work — stays resident.
# Outside a policy-remat the tag is an identity primitive XLA erases.
CONV_SAVE_NAME = "hconv_out"


def _tuple(v, nd):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v,) * nd


def torch_kernel_init(init_type="kaiming", transpose=False, gain=0.02):
    """Kernel initializers with PyTorch fan conventions.

    fan_in of a torch conv weight (O,I,*k) is I*prod(k); of a transpose
    conv weight (I,O,*k) it is O*prod(k).  Our storage is (*k,I,O).
    """

    def init(key, shape, dtype=jnp.float32):
        nd = len(shape) - 2
        rf = math.prod(shape[:nd])
        i, o = shape[nd], shape[nd + 1]
        fan_in = (o if transpose else i) * rf
        fan_out = (i if transpose else o) * rf
        if init_type == "kaiming":
            std = math.sqrt(2.0 / fan_in)
        elif init_type == "xavier":
            std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        elif init_type == "normal":
            std = gain
        elif init_type == "orthogonal":
            # torch nn.init.orthogonal_ semantics (networks_2d/unet.py:19):
            # the weight is viewed as (dim0, prod(rest)) and filled with a
            # semi-orthogonal matrix scaled by gain.  conv (O,I,*k) ->
            # rows=O, cols=I*rf; transpose (I,O,*k) -> rows=I, cols=O*rf.
            rows = o if not transpose else i
            q = jax.nn.initializers.orthogonal(scale=gain)(
                key, (rows, math.prod(shape) // rows), dtype)
            if transpose:   # (I, O*rf) -> (I, O, *k) -> (*k, I, O)
                q = q.reshape((i, o) + shape[:nd])
                return jnp.transpose(q, tuple(range(2, nd + 2)) + (0, 1))
            # (O, I*rf) -> (O, I, *k) -> (*k, I, O)
            q = q.reshape((o, i) + shape[:nd])
            return jnp.transpose(q, tuple(range(2, nd + 2)) + (1, 0))
        else:
            raise NotImplementedError(f"init {init_type!r}")
        return std * jax.random.normal(key, shape, dtype)

    return init


class HConv(nn.Module):
    """Convolution with optional Hebbian plasticity (2D or 3D by kernel
    rank)."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    transpose: bool = False

    def _nd(self):
        if isinstance(self.kernel_size, (tuple, list)):
            return len(self.kernel_size)
        return 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = self._nd()
        k = _tuple(self.kernel_size, nd)
        strides = _tuple(self.strides, nd)
        pad = _tuple(self.padding, nd)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_kernel_init(self.init_type, self.transpose),
            k + (in_ch, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        spec = spec_if_active(self.hebb, self.path)
        dtype = self.dtype or x.dtype
        w = kernel
        if spec is not None and spec.w_nrm:
            w = rules.normalize(w, rules.weight_norm_axes(nd, self.transpose))
        w = w.astype(dtype)
        x = x.astype(dtype)

        # Forward convs pad NATIVELY inside the conv op: a materialized
        # jnp.pad + VALID costs a full activation copy/relayout per conv
        # on TPU.  Transpose convs keep the reference's manual input
        # padding (hebb.py:221-232) — every transpose site in the model
        # zoo is pad=0, so nothing materializes there either.
        pad_cfg = None
        if self.transpose:
            if any(pad):
                cfg = [(0, 0)] + [(p, p) for p in pad] + [(0, 0)]
                x = jnp.pad(x, cfg)
            y = rules.conv_transpose_fwd(x, w, strides)
        else:
            pad_cfg = tuple((p, p) for p in pad)
            y = rules.conv_fwd(x, w, strides, pad_cfg)
        if bias is not None:
            y = y + bias.astype(dtype)

        if spec is not None and train and spec.alpha != 0:
            key = (self.make_rng("hebb")
                   if spec.conv_mode(self.transpose) == "contrastive"
                   else None)
            # Delta compute dtype: f32 by default; HEBBAX_DELTA_DTYPE=
            # bfloat16 halves the HBM traffic of the weight-grad convs'
            # operand relayouts (MXU still accumulates f32).
            ddt = rules.delta_compute_dtype()
            delta = rules.compute_delta(
                spec, jax.lax.stop_gradient(kernel).astype(ddt),
                x.astype(ddt), y.astype(ddt),
                strides, self.transpose, key=key,
                bias=None if bias is None
                else jax.lax.stop_gradient(bias).astype(ddt),
                padding=pad_cfg)
            delta = delta.astype(jnp.float32)
            # shared decoders (CCT) call the same conv several times per
            # step; accumulate like the reference's `delta_w +=`.
            self.sow("hebb", "delta", jax.lax.stop_gradient(delta),
                     init_fn=lambda: 0.0,
                     reduce_fn=lambda acc, v: acc + v)
        return checkpoint_name(y, CONV_SAVE_NAME)


class HConvTranspose(HConv):
    """Transpose convolution (output = (in-1)*stride + k, reference
    padding semantics: input padded manually, hebb.py:221-232)."""

    transpose: bool = True


class FoldedHConv(nn.Module):
    """HConv computed in space-to-depth folded layout (ops/s2d.py).

    Parameters are IDENTICAL to HConv — the original (k, k, Ci, Co)
    kernel and (Co,) bias — so checkpoints, Hebbian exclusion paths and
    param-count parity are unchanged; only the compute layout differs
    (the structured folded kernel makes small-C convs MXU-shaped).
    Exact-equivalence with HConv is asserted in tests/test_s2d.py.

    Input/output are FOLDED tensors; ``in_groups`` gives the original
    channel counts of the folded input's concatenated sources.  Only
    stride-1 forward convs (the folded call sites) are supported.
    Hebbian modes: swta / hpca (the _t modes resolve to these on
    forward convs; no folded site is a transpose conv).

    ``depth`` folds more than once: the input/output carry ``4**depth``
    subpixel blocks per original channel (a 4x4 spatial block at
    depth=2) and the kernel fold composes — ``fold_conv_kernel`` of the
    once-folded kernel is exactly the twice-folded conv, since the
    folded operator is itself a stride-1 conv on the folded lattice.
    """

    features: int
    kernel_size: int
    in_groups: Sequence[int]
    use_bias: bool = True
    depth: int = 1
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops import s2d

        k = int(self.kernel_size)
        ci = sum(self.in_groups)
        assert x.shape[-1] == 4 ** self.depth * ci, \
            (x.shape, self.in_groups, self.depth)
        kernel = self.param(
            "kernel", torch_kernel_init(self.init_type, False),
            (k, k, ci, self.features))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,))
                if self.use_bias else None)

        spec = spec_if_active(self.hebb, self.path)
        dtype = self.dtype or x.dtype
        w = kernel
        if spec is not None and spec.w_nrm:
            w = rules.normalize(w, rules.weight_norm_axes(2, False))
        w = w.astype(dtype)
        x = x.astype(dtype)

        in_groups = tuple(int(g) for g in self.in_groups)
        wf, groups_d = w, in_groups
        for _ in range(self.depth):
            wf = s2d.fold_conv_kernel(wf, groups_d)
            groups_d = tuple(4 * g for g in groups_d)
        pad = ((k // 2, k // 2),) * 2
        y = rules.conv_fwd(x, wf, (1, 1), pad)
        if bias is not None:
            b = bias.astype(dtype)
            for _ in range(self.depth):
                b = s2d.fold_bias(b)
            y = y + b

        if spec is not None and train and spec.alpha != 0:
            mode = spec.conv_mode(False)
            if mode not in ("swta", "hpca"):
                raise NotImplementedError(
                    f"FoldedHConv supports swta/hpca, got {mode!r}")
            ddt = rules.delta_compute_dtype()
            w_d = jax.lax.stop_gradient(kernel).astype(ddt)
            x_d = jax.lax.stop_gradient(x).astype(ddt)
            y_d = jax.lax.stop_gradient(y).astype(ddt)
            co = self.features
            if self.depth != 1 and len(in_groups) != 1:
                raise NotImplementedError(
                    "FoldedHConv delta at depth>1 supports single-group "
                    "inputs only (the depth-2 sites are the MLP head)")
            if os.environ.get("HEBBAX_S2D_FOLDED_DELTA") \
                    and self.depth == 1:
                # folded-layout wgrad: MXU-shaped but computes all 144
                # (tap, block) slots for the 36 real ones (4x FLOPs) —
                # measured SLOWER end-to-end than the unfolded rule
                delta = self._folded_delta(spec, mode, w_d, x_d, y_d, k,
                                           in_groups, co, pad)
            else:
                # unfold x/y (two relayouts) and run the original-layout
                # rule: 1x FLOPs; the relayouts are cheaper than the 3x
                # redundant folded wgrad work
                # a folded concat keeps per-source subpixel blocks, so
                # unfold each group separately before re-concatenating
                parts, off = [], 0
                for g in in_groups:
                    p = x_d[..., off:off + 4 ** self.depth * g]
                    for _ in range(self.depth):
                        p = s2d.unfold(p)
                    parts.append(p)
                    off += 4 ** self.depth * g
                xu = parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=-1)
                yu = y_d
                for _ in range(self.depth):
                    yu = s2d.unfold(yu)
                if mode == "swta":
                    delta = rules.swta_conv_delta(w_d, xu, yu, spec.k,
                                                  (1, 1), padding=pad)
                else:
                    delta = rules.hpca_conv_delta(w_d, xu, yu, (1, 1),
                                                  padding=pad)
            self.sow("hebb", "delta",
                     jax.lax.stop_gradient(delta.astype(jnp.float32)),
                     init_fn=lambda: 0.0,
                     reduce_fn=lambda acc, v: acc + v)
        return checkpoint_name(y, CONV_SAVE_NAME)

    def _folded_delta(self, spec, mode, w_d, x_d, y_d, k, in_groups, co,
                      pad):
        from ..ops import s2d

        if mode == "swta":
            r = s2d.per_subpixel(
                lambda t: jax.nn.softmax(spec.k * t, axis=-1), y_d, co)
            cot = r
        else:
            cot = y_d
        wf_shape = s2d.folded_kernel_shape(k, in_groups, co)
        pos_f = rules._wgrad(rules.conv_fwd, x_d, wf_shape, cot,
                             (1, 1), pad)
        pos = s2d.unfold_wgrad(pos_f, k, in_groups, co)
        if mode == "swta":
            r_sum = jnp.sum(r.reshape(-1, co), axis=0)
            return pos - r_sum * w_d
        yf = cot.reshape(-1, co)
        m = yf.T @ yf
        dec = jnp.einsum("ab,...b->...a",
                         m * rules._sanger_tril(co, w_d.dtype), w_d)
        return pos - dec


class FoldedHConv3(nn.Module):
    """HConv (3D) computed in space-to-depth folded layout (ops/s2d3d).

    Parameters are IDENTICAL to HConv — the original (k, k, k, Ci, Co)
    kernel and (Co,) bias — so checkpoints, Hebbian exclusion paths and
    param-count parity are unchanged; only the compute layout differs.
    ``fold`` gives the per-axis spatial factors (measured-profitable
    default (2,1,1) for the C=64 top level: 2x FLOPs at ~125 vs
    ~46 TF/s — scripts/microbench_conv3d.py).  Input/output are FOLDED
    tensors; ``in_groups`` gives the original channel counts of the
    folded input's concatenated sources.  Stride-1 forward convs only.
    Exactness vs HConv is asserted in tests/test_unet3d_s2d.py."""

    features: int
    kernel_size: int
    in_groups: Sequence[int]
    fold: Sequence[int] = (2, 1, 1)
    use_bias: bool = True
    # emit the folded OUTPUT in grouped-concat order (s2d3d.group_out_perm)
    # instead of standard subpixel-major — free (kernel-side) layout change
    # that lets residual adds against folded concats skip regroup3
    out_groups: Optional[Sequence[int]] = None
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops import s2d3d

        k = int(self.kernel_size)
        f = tuple(int(a) for a in self.fold)
        pf = s2d3d.prodf(f)
        ci = sum(self.in_groups)
        assert x.shape[-1] == pf * ci, (x.shape, self.in_groups, f)
        kernel = self.param(
            "kernel", torch_kernel_init(self.init_type, False),
            (k, k, k, ci, self.features))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,))
                if self.use_bias else None)

        spec = spec_if_active(self.hebb, self.path)
        dtype = self.dtype or x.dtype
        w = kernel
        if spec is not None and spec.w_nrm:
            w = rules.normalize(w, rules.weight_norm_axes(3, False))
        w = w.astype(dtype)
        x = x.astype(dtype)

        in_groups = tuple(int(g) for g in self.in_groups)
        wf = s2d3d.fold_conv_kernel3(w, in_groups, f)
        # trimmed folded kernel: pad folded_k//2 per axis (== k//2 only
        # when folded_k == k, e.g. k=3 f<=2); the DELTA rule below runs
        # in the ORIGINAL layout and keeps the original k//2 pad
        pad = s2d3d.folded_pad3(k, f)
        pad_orig = ((k // 2, k // 2),) * 3
        bias_f = (s2d3d.fold_bias3(bias.astype(dtype), f)
                  if bias is not None else None)
        if self.out_groups is not None:
            perm = s2d3d.group_out_perm(self.features,
                                        tuple(self.out_groups), f)
            wf = wf[..., perm]
            if bias_f is not None:
                bias_f = bias_f[perm]
        y = rules.conv_fwd(x, wf, (1, 1, 1), pad)
        if bias_f is not None:
            y = y + bias_f

        if spec is not None and train and spec.alpha != 0:
            mode = spec.conv_mode(False)
            if mode not in ("swta", "hpca"):
                raise NotImplementedError(
                    f"FoldedHConv3 supports swta/hpca, got {mode!r}")
            ddt = rules.delta_compute_dtype()
            w_d = jax.lax.stop_gradient(kernel).astype(ddt)
            # unfold x/y (relayouts) and run the original-layout rule —
            # the folded wgrad computes prod(f)^2 redundant slots
            parts, off = [], 0
            for g in in_groups:
                parts.append(s2d3d.unfold3(
                    jax.lax.stop_gradient(x[..., off:off + pf * g])
                    .astype(ddt), f))
                off += pf * g
            xu = parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=-1)
            y_d = jax.lax.stop_gradient(y).astype(ddt)
            if self.out_groups is not None:
                # grouped output: unfold per group (each block is a
                # standard-order folded tensor of its own)
                yparts, off = [], 0
                for g in self.out_groups:
                    yparts.append(s2d3d.unfold3(
                        y_d[..., off:off + pf * g], f))
                    off += pf * g
                yu = jnp.concatenate(yparts, axis=-1)
            else:
                yu = s2d3d.unfold3(y_d, f)
            if mode == "swta":
                delta = rules.swta_conv_delta(w_d, xu, yu, spec.k,
                                              (1, 1, 1),
                                              padding=pad_orig)
            else:
                delta = rules.hpca_conv_delta(w_d, xu, yu, (1, 1, 1),
                                              padding=pad_orig)
            self.sow("hebb", "delta",
                     jax.lax.stop_gradient(delta.astype(jnp.float32)),
                     init_fn=lambda: 0.0,
                     reduce_fn=lambda acc, v: acc + v)
        return checkpoint_name(y, CONV_SAVE_NAME)


class FoldedHConvTranspose3(nn.Module):
    """HConvTranspose (k=2, s=2) whose OUTPUT is space-to-depth folded:
    the f==2 axes' taps absorb into output channel blocks
    (ops/s2d3d.fold_transpose_kernel3), so the op is a dense matmul —
    1x FLOPs, ideal MXU shape.  Input arrives UNFOLDED (the deeper,
    already-aligned level).  Params identical to HConvTranspose."""

    features: int
    fold: Sequence[int] = (2, 1, 1)
    use_bias: bool = True
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops import s2d3d

        f = tuple(int(a) for a in self.fold)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init(self.init_type, True),
            (2, 2, 2, in_ch, self.features))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,))
                if self.use_bias else None)

        spec = spec_if_active(self.hebb, self.path)
        dtype = self.dtype or x.dtype
        w = kernel
        if spec is not None and spec.w_nrm:
            w = rules.normalize(w, rules.weight_norm_axes(3, True))
        w = w.astype(dtype)
        x = x.astype(dtype)

        wf, strides = s2d3d.fold_transpose_kernel3(w, f)
        y = rules.conv_transpose_fwd(x, wf, strides)
        if bias is not None:
            y = y + s2d3d.fold_bias3(bias.astype(dtype), f)

        if spec is not None and train and spec.alpha != 0:
            key = (self.make_rng("hebb")
                   if spec.conv_mode(True) == "contrastive" else None)
            ddt = rules.delta_compute_dtype()
            yu = s2d3d.unfold3(
                jax.lax.stop_gradient(y).astype(ddt), f)
            delta = rules.compute_delta(
                spec, jax.lax.stop_gradient(kernel).astype(ddt),
                jax.lax.stop_gradient(x).astype(ddt), yu,
                (2, 2, 2), True, key=key,
                bias=None if bias is None
                else jax.lax.stop_gradient(bias).astype(ddt),
                padding=None)
            self.sow("hebb", "delta",
                     jax.lax.stop_gradient(delta.astype(jnp.float32)),
                     init_fn=lambda: 0.0,
                     reduce_fn=lambda acc, v: acc + v)
        return checkpoint_name(y, CONV_SAVE_NAME)


class FoldedDownHConv3(nn.Module):
    """HConv (3D, k=2, s=2, VALID — the VNet DownTransition down_conv,
    reference vnet.py:85-104) CONSUMING a space-to-depth folded input.

    On fully folded axes both strided taps live inside one folded pixel
    (s2d3d.fold_down_kernel3), so with fold (2,2,2) the op is a dense
    (8·Ci, Co) matmul — measured 0.60 -> 0.05 ms for the 16->32 full-res
    site (scripts/microbench_vnet.py).  Output is UNFOLDED (it already
    lives at the strided resolution).  Params identical to
    HConv(kernel_size=2, strides=2)."""

    features: int
    fold: Sequence[int] = (2, 2, 2)
    in_groups: Sequence[int] = None
    use_bias: bool = True
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops import s2d3d

        f = tuple(int(a) for a in self.fold)
        pf = s2d3d.prodf(f)
        in_groups = (tuple(int(g) for g in self.in_groups)
                     if self.in_groups else (x.shape[-1] // pf,))
        ci = sum(in_groups)
        assert x.shape[-1] == pf * ci, (x.shape, in_groups, f)
        kernel = self.param(
            "kernel", torch_kernel_init(self.init_type, False),
            (2, 2, 2, ci, self.features))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,))
                if self.use_bias else None)

        spec = spec_if_active(self.hebb, self.path)
        dtype = self.dtype or x.dtype
        w = kernel
        if spec is not None and spec.w_nrm:
            w = rules.normalize(w, rules.weight_norm_axes(3, False))
        w = w.astype(dtype)
        x = x.astype(dtype)

        if len(in_groups) > 1:
            x = s2d3d.regroup3(x, in_groups, f)
        wf, strides = s2d3d.fold_down_kernel3(w, f)
        y = rules.conv_fwd(x, wf, strides)
        if bias is not None:
            y = y + bias.astype(dtype)

        if spec is not None and train and spec.alpha != 0:
            mode = spec.conv_mode(False)
            if mode not in ("swta", "hpca"):
                raise NotImplementedError(
                    f"FoldedDownHConv3 supports swta/hpca, got {mode!r}")
            ddt = rules.delta_compute_dtype()
            w_d = jax.lax.stop_gradient(kernel).astype(ddt)
            xu = s2d3d.unfold3(
                jax.lax.stop_gradient(x).astype(ddt), f)
            yu = jax.lax.stop_gradient(y).astype(ddt)
            if mode == "swta":
                delta = rules.swta_conv_delta(w_d, xu, yu, spec.k,
                                              (2, 2, 2))
            else:
                delta = rules.hpca_conv_delta(w_d, xu, yu, (2, 2, 2))
            self.sow("hebb", "delta",
                     jax.lax.stop_gradient(delta.astype(jnp.float32)),
                     init_fn=lambda: 0.0,
                     reduce_fn=lambda acc, v: acc + v)
        return checkpoint_name(y, CONV_SAVE_NAME)
