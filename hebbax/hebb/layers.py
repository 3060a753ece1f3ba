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
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import rules
from .spec import HebbSpec, spec_if_active


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

        if any(pad):
            cfg = [(0, 0)] + [(p, p) for p in pad] + [(0, 0)]
            x = jnp.pad(x, cfg)

        fwd = rules.conv_transpose_fwd if self.transpose else rules.conv_fwd
        y = fwd(x, w, strides)
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
                else jax.lax.stop_gradient(bias).astype(ddt))
            delta = delta.astype(jnp.float32)
            # shared decoders (CCT) call the same conv several times per
            # step; accumulate like the reference's `delta_w +=`.
            self.sow("hebb", "delta", jax.lax.stop_gradient(delta),
                     init_fn=lambda: 0.0,
                     reduce_fn=lambda acc, v: acc + v)
        return y


class HConvTranspose(HConv):
    """Transpose convolution (output = (in-1)*stride + k, reference
    padding semantics: input padded manually, hebb.py:221-232)."""

    transpose: bool = True
