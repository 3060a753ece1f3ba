"""Spiking VGG9 segmentation network (reference: snn_models/snn_vgg.py,
snn_models/spikes.py, snn_models/ann_vgg.py).

Live architecture 'dl-vgg9' (snn_vgg.py:21-28):
  features  : conv64, conv64, [avgpool k3 s2 p1], conv128, conv128,
              [avgpool], conv256, atrous256 (pad 2, dil 2), atrous256
  classifier: atrous1024 (pad 12, dil 12), then an 'output' 1x1 conv
              accumulated WITHOUT leak over timesteps (snn_vgg.py:460-465)
All convs bias-free, per-timestep BatchNorm (BNTT, scale-only affine,
eps 1e-4), leaky integrate-and-fire (leak 0.99, threshold 1.0,
subtract-reset), Poisson rate-coded input (sign(x) * [U(0,1) <= |x|]),
T=20 timesteps, final voltage / T upsampled bilinearly (align_corners).

Surrogate gradients via jax.custom_vjp: Linear (Bellec'18,
gamma=0.3 * relu(1-|x|)) and FastSigm/SuperSpike (Zenke'18,
1/(100|x|+1)^2).

TPU note: the timestep loop is unrolled (static T) because BNTT gives
each timestep its own BN parameters; XLA still fuses each step's
conv+BN+LIF chain.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .common import resize_linear_align_corners

FEATURES = (64, 64, 128, 128, 256, 256, 256)
ATROUS_FROM = 5          # feature layers 5,6 are atrous (dil 2)
POOL_AFTER = (1, 3)      # avgpool after feature layers 1 and 3 (0-based)
TIMESTEPS = 20
LEAK = 0.99
THRESHOLD = 1.0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def spike(x, grad_type="Linear"):
    return (x > 0).astype(x.dtype)


def _spike_fwd(x, grad_type):
    return (x > 0).astype(x.dtype), x


def _spike_bwd(grad_type, x, g):
    if grad_type == "Linear":
        grad = g * 0.3 * jnp.maximum(1.0 - jnp.abs(x), 0.0)
    elif grad_type == "FastSigm":
        grad = g / (100.0 * jnp.abs(x) + 1.0) ** 2
    elif grad_type == "Exp":
        grad = g * jnp.exp(-10.0 * jnp.abs(x))
    else:  # PassThru
        grad = g
    return (grad,)


spike.defvjp(_spike_fwd, _spike_bwd)


def poisson_spikes(key, x):
    """PoissonGenerator (spikes.py:23-35)."""
    r = jax.random.uniform(key, x.shape, x.dtype)
    return (r <= jnp.abs(x)).astype(x.dtype) * jnp.sign(x)


def avg_pool_3s2p1(x):
    """AvgPool2d(kernel 3, stride 2, padding 1) with count_include_pad
    (torch default)."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


class _BNTT(nn.Module):
    """Per-timestep scale-only BatchNorm (snn_vgg.py:134-135,198-204)."""

    timesteps: int = TIMESTEPS

    @nn.compact
    def __call__(self, x, t: int, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-4,
            use_bias=False, name=f"bn_t{t}")(x)


def _xavier_gain2(key, shape, dtype=jnp.float32):
    """xavier_uniform_(gain=2) on a torch (O,I,kh,kw) weight
    (snn_vgg.py:207-209)."""
    import math
    nd = len(shape) - 2
    rf = math.prod(shape[:nd])
    fan_in, fan_out = shape[nd] * rf, shape[nd + 1] * rf
    a = 2.0 * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


class SNNVGG(nn.Module):
    """SNN_VGG dl-vgg9 (snn_vgg.py:33-478)."""

    in_channels: int
    n_cls: int
    timesteps: int = TIMESTEPS
    grad_type: str = "Linear"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = functools.partial(nn.Conv, use_bias=False,
                                 kernel_init=_xavier_gain2,
                                 dtype=self.dtype)
        # the reference hardcodes 3 input channels (snn_vgg.py:108)
        feats = [conv(c, (3, 3), padding=1, name=f"feat{i}")
                 if i < ATROUS_FROM else
                 conv(c, (3, 3), padding=2, kernel_dilation=2,
                      name=f"feat{i}")
                 for i, c in enumerate(FEATURES)]
        feat_bns = [_BNTT(self.timesteps, name=f"feat_bn{i}")
                    for i in range(len(FEATURES))]
        cls_atrous = conv(1024, (3, 3), padding=12, kernel_dilation=12,
                          name="cls_atrous")
        cls_bn = _BNTT(self.timesteps, name="cls_bn")
        out_conv = conv(self.n_cls, (1, 1), padding=0, name="output")

        h, w = x.shape[1], x.shape[2]
        mems = [None] * (len(FEATURES) + 1)
        out_mem = jnp.zeros(x.shape[:1] + (h // 4, w // 4, self.n_cls),
                            x.dtype)

        base_key = (self.make_rng("poisson") if self.has_rng("poisson")
                    else jax.random.PRNGKey(0))

        def lif(mem, layer, bn, inp, t):
            pre = bn(layer(inp), t, train)
            mem = (LEAK * mem if mem is not None else 0.0) + pre
            thr = mem / THRESHOLD - 1.0
            out = spike(thr, self.grad_type)
            mem = mem - (thr > 0) * THRESHOLD
            return mem, out

        for t in range(self.timesteps):
            out_prev = poisson_spikes(jax.random.fold_in(base_key, t), x)
            for k in range(len(FEATURES)):
                mems[k], out_prev = lif(mems[k], feats[k], feat_bns[k],
                                        out_prev, t)
                if k in POOL_AFTER:
                    out_prev = avg_pool_3s2p1(out_prev)
            mems[-1], out_prev = lif(mems[-1], cls_atrous, cls_bn,
                                     out_prev, t)
            out_mem = out_mem + out_conv(out_prev)

        out = out_mem / self.timesteps
        return resize_linear_align_corners(out, (h, w))


class ANNVGG(nn.Module):
    """Non-spiking twin (snn_models/ann_vgg.py): same topology with ReLU +
    single BN, used for ANN->SNN conversion baselines."""

    in_channels: int
    n_cls: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = functools.partial(nn.Conv, use_bias=False,
                                 kernel_init=_xavier_gain2,
                                 dtype=self.dtype)
        h, w = x.shape[1], x.shape[2]
        for i, c in enumerate(FEATURES):
            if i < ATROUS_FROM:
                x = conv(c, (3, 3), padding=1, name=f"feat{i}")(x)
            else:
                x = conv(c, (3, 3), padding=2, kernel_dilation=2,
                         name=f"feat{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-4, use_bias=False,
                             name=f"feat_bn{i}")(x)
            x = nn.relu(x)
            if i in POOL_AFTER:
                x = avg_pool_3s2p1(x)
        x = conv(1024, (3, 3), padding=12, kernel_dilation=12,
                 name="cls_atrous")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-4, use_bias=False, name="cls_bn")(x)
        x = nn.relu(x)
        x = conv(self.n_cls, (1, 1), padding=0, name="output")(x)
        return resize_linear_align_corners(x, (h, w))
