"""DDPM networks (reference: models/networks_2d/unet_ddpm.py:222-437).

The reference's DDPM_Wrapper subclasses lucidrains' Unet but comments out
every resnet/attention/mid block; what actually runs
(unet_ddpm.py:323-368) is:

  init ConvBlockLeaky(in+cls -> 64, p=.05)
  + time embedding (SinusoidalPosEmb(64) -> Linear 256 -> GELU -> Linear 64)
    added channelwise
  -> 4 DownBlocks (64->64,128,256,512, dropouts .1/.2/.3/.4)
  -> 4 UpBlocks (bilinear, skip concat)
  -> final 3x3 conv to out_dim.

DDPMUNet (unet_ddpm.py:378-420) holds two such nets — `net` predicting the
image stream (pred_noise) and `net_seg` predicting the mask stream
(pred_x0) — plus a 3x3 probe conv `final_conv`.
"""

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..hebb.layers import HConv
from ..hebb.spec import HebbSpec
from .unet2d import ConvBlockLeaky, UpBlock2D
from .common import max_pool

DIMS = (64, 64, 128, 256, 512)
DROPOUT = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5)


def sinusoidal_pos_emb(t, dim, theta=10000.0):
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * (-math.log(theta) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeUNet2D(nn.Module):
    """One DDPM_Wrapper-equivalent network."""

    out_dim: int
    dim: int = 64
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        t = sinusoidal_pos_emb(time, self.dim)
        t = nn.Dense(self.dim * 4, name="time_fc1")(t)
        t = nn.Dense(self.dim, name="time_fc2")(nn.gelu(t))

        x = ConvBlockLeaky(DIMS[0], DROPOUT[0], name="init_conv",
                           **kw)(x, train)
        x = x + t[:, None, None, :]

        skips = []
        for i in range(4):
            skips.append(x)
            x = max_pool(x)
            x = ConvBlockLeaky(DIMS[i + 1], DROPOUT[i + 1],
                               name=f"down{i + 1}", **kw)(x, train)
        for i, ch in enumerate((DIMS[3], DIMS[2], DIMS[1], DIMS[0])):
            x = UpBlock2D(ch, ch, name=f"up{i + 1}", **kw)(
                x, skips.pop(), train)
        return HConv(self.out_dim, kernel_size=3, padding=1,
                     name="final_conv", **kw)(x, train)


class DDPMUNet(nn.Module):
    """Container with both diffusion nets + the linear-probe head
    (unet_ddpm.py:378-420).  Call modes:
      mode='probe'  : final_conv(x)                  (DDPMUNet.forward)
      mode='net'    : net(x, t)     — image stream (pred_noise)
      mode='net_seg': net_seg(x, t) — mask stream  (pred_x0)
    """

    in_channels: int
    n_cls: int
    timesteps: int = 1000
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time=None, mode: str = "probe",
                 train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        if mode == "probe":
            return HConv(self.n_cls, kernel_size=3, padding=1,
                         name="final_conv", **kw)(x, train)
        if mode == "net":
            return TimeUNet2D(self.in_channels, name="net", **kw)(
                x, time, train)
        if mode == "net_seg":
            return TimeUNet2D(self.n_cls, name="net_seg", **kw)(
                x, time, train)
        raise ValueError(mode)
