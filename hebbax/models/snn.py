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

TPU note: the timestep loop is a lax.scan over STACKED per-timestep BN
parameters/statistics ((T, C) arrays indexed by the scan counter), so
the compiled program contains ONE timestep body instead of T copies —
a 20x smaller program (first compile through the axon tunnel is
20-120 s, CLAUDE.md).  The body is pure JAX (kernels are read from the
module scope before the scan; BN running stats thread through the scan
carry and are written back after), numerically identical to T separate
flax BatchNorms (momentum 0.9, eps 1e-4, scale-only, biased batch
variance in the running stats).
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


def _xavier_gain2(key, shape, dtype=jnp.float32):
    """xavier_uniform_(gain=2) on a torch (O,I,kh,kw) weight
    (snn_vgg.py:207-209)."""
    import math
    nd = len(shape) - 2
    rf = math.prod(shape[:nd])
    fan_in, fan_out = shape[nd] * rf, shape[nd + 1] * rf
    a = 2.0 * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def _conv2d(x, kernel, dilation=1, padding=1):
    """Bias-free NHWC conv (pure lax — callable inside the scan body)."""
    return lax.conv_general_dilated(
        x, kernel, (1, 1), [(padding, padding)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class SNNVGG(nn.Module):
    """SNN_VGG dl-vgg9 (snn_vgg.py:33-478).

    The timestep loop is a lax.scan; BNTT parameters and running stats
    are stacked (T, C) arrays indexed by the scan counter (see module
    docstring).  Conv kernels are plain ``self.param`` HWIO arrays so the
    scan body stays pure JAX (flax modules cannot be called inside a raw
    lax.scan)."""

    in_channels: int
    n_cls: int
    timesteps: int = TIMESTEPS
    grad_type: str = "Linear"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        t_total = self.timesteps
        sites = []  # (kernel, dilation, padding, features) per LIF site
        c_in = x.shape[-1]
        for idx, c in enumerate(FEATURES):
            dil = 1 if idx < ATROUS_FROM else 2
            k = self.param(f"feat{idx}", _xavier_gain2, (3, 3, c_in, c))
            sites.append((k, dil, dil, c))
            c_in = c
        k_cls = self.param("cls_atrous", _xavier_gain2, (3, 3, c_in, 1024))
        sites.append((k_cls, 12, 12, 1024))
        k_out = self.param("output", _xavier_gain2,
                           (1, 1, 1024, self.n_cls))

        # stacked scale-only BNTT params + running stats, (T, C) each
        bn_names = [f"feat_bn{i}" for i in range(len(FEATURES))] + \
            ["cls_bn"]
        scales = [self.param(f"{n}_scale", lambda key, s: jnp.ones(s),
                             (t_total, site[3]))
                  for n, site in zip(bn_names, sites)]
        ra_means = [self.variable("batch_stats", f"{n}_mean",
                                  jnp.zeros, (t_total, site[3]))
                    for n, site in zip(bn_names, sites)]
        ra_vars = [self.variable("batch_stats", f"{n}_var",
                                 jnp.ones, (t_total, site[3]))
                   for n, site in zip(bn_names, sites)]

        h, w = x.shape[1], x.shape[2]
        base_key = (self.make_rng("poisson") if self.has_rng("poisson")
                    else jax.random.PRNGKey(0))
        grad_type = self.grad_type
        mean0 = [m.value for m in ra_means]
        var0 = [v.value for v in ra_vars]

        def bn(pre, s, t, means, varis):
            """Scale-only BN at timestep t; flax semantics: train
            normalizes with batch stats and blends them into the running
            stats (momentum 0.9, biased variance); eval uses running."""
            if train:
                mu = jnp.mean(pre, axis=(0, 1, 2))
                var = jnp.var(pre, axis=(0, 1, 2))
                means = means.at[t].set(0.9 * means[t] + 0.1 * mu)
                varis = varis.at[t].set(0.9 * varis[t] + 0.1 * var)
            else:
                mu, var = means[t], varis[t]
            y = scales[s][t] * (pre - mu) * lax.rsqrt(var + 1e-4)
            return y, means, varis

        def body(carry, t):
            mems, out_mem, means, varis = carry
            out_prev = poisson_spikes(jax.random.fold_in(base_key, t), x)
            mems2, means2, varis2 = [], [], []
            for s, (kernel, dil, pad, _) in enumerate(sites):
                pre = _conv2d(out_prev, kernel, dil, pad)
                pre, m_new, v_new = bn(pre, s, t, means[s], varis[s])
                means2.append(m_new)
                varis2.append(v_new)
                mem = LEAK * mems[s] + pre
                thr = mem / THRESHOLD - 1.0
                out_prev = spike(thr, grad_type)
                mems2.append(mem - (thr > 0) * THRESHOLD)
                if s in POOL_AFTER:
                    out_prev = avg_pool_3s2p1(out_prev)
            out_mem = out_mem + _conv2d(out_prev, k_out, 1, 0)
            return (tuple(mems2), out_mem, tuple(means2),
                    tuple(varis2)), None

        # membrane shapes: track through the pools statically
        mems0, hh, ww = [], h, w
        for s, (_, _, _, c) in enumerate(sites):
            mems0.append(jnp.zeros(x.shape[:1] + (hh, ww, c), x.dtype))
            if s in POOL_AFTER:
                hh, ww = -(-hh // 2), -(-ww // 2)
        out_mem0 = jnp.zeros(x.shape[:1] + (hh, ww, self.n_cls), x.dtype)

        carry0 = (tuple(mems0), out_mem0, tuple(mean0), tuple(var0))
        (mems, out_mem, means, varis), _ = lax.scan(
            body, carry0, jnp.arange(t_total))
        if train and not self.is_initializing():
            for s in range(len(sites)):
                ra_means[s].value = means[s]
                ra_vars[s].value = varis[s]

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
