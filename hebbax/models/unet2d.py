"""2D UNet family (reference: models/networks_2d/unet.py:423-478 and the
urpc/cct/vae/superpix variants).

Architecture contract replicated from the live reference models:

* Encoder: ConvBlockLeaky(in->16, p=.05) then 4x [maxpool2 +
  ConvBlockLeaky] with channels [32,64,128,256], dropout [.1,.2,.3,.5]
  (unet.py:48-64,186-227).
* Decoder ("DecoderLeaky", unet.py:268-303): 4 UpBlocks, each = 1x1 conv +
  bilinear(align_corners=True) 2x upsample + concat(skip, up) + two
  conv3x3-BN-ReLU (the reference's UpBlock default bilinear=True branch —
  despite the class name there are NO transpose convs in the live 2D zoo).
* Heads differ per variant (unet.py:443-455, unet_urpc.py:225-233,
  unet_cct.py:210-212, unet_vae.py:216-244, unet_superpix.py:220-245).

TPU-native: channels-last, every conv is an HConv (optionally Hebbian via
a static HebbSpec — no module surgery), static shapes, jit-safe.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropout import FastDropout
from ..hebb.layers import HConv
from ..hebb.spec import HebbSpec
from .common import (batch_norm, max_pool, perturb_features,
                     resize_linear_align_corners, resize_nearest_torch)

FEATURES = (16, 32, 64, 128, 256)
ENC_DROPOUT = (0.05, 0.1, 0.2, 0.3, 0.5)
BN_GAIN = 0.02  # reference init_weights: BN2d weight ~ N(1, 0.02)


class ConvBlockLeaky(nn.Module):
    """conv3-BN-LeakyReLU-Dropout(p)-conv3-BN-LeakyReLU (unet.py:48-64)."""

    features: int
    dropout_p: float
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(kernel_size=3, padding=1, hebb=self.hebb,
                  init_type=self.init_type, dtype=self.dtype)
        x = HConv(self.features, name="conv1", **kw)(x, train)
        x = batch_norm(self, x, train, "bn1", BN_GAIN, self.dtype)
        x = nn.leaky_relu(x)
        x = FastDropout(self.dropout_p, deterministic=not train)(x)
        x = HConv(self.features, name="conv2", **kw)(x, train)
        x = batch_norm(self, x, train, "bn2", BN_GAIN, self.dtype)
        return nn.leaky_relu(x)


class ConvBlockReLU(nn.Module):
    """conv3-BN-ReLU x2 (the decoder's ConvBlock, unet.py:31-45)."""

    features: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(kernel_size=3, padding=1, hebb=self.hebb,
                  init_type=self.init_type, dtype=self.dtype)
        x = HConv(self.features, name="conv1", **kw)(x, train)
        x = batch_norm(self, x, train, "bn1", BN_GAIN, self.dtype)
        x = nn.relu(x)
        x = HConv(self.features, name="conv2", **kw)(x, train)
        x = batch_norm(self, x, train, "bn2", BN_GAIN, self.dtype)
        return nn.relu(x)


class Encoder2D(nn.Module):
    """5-feature encoder (unet.py:186-213)."""

    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        feats = []
        x = ConvBlockLeaky(FEATURES[0], ENC_DROPOUT[0], name="in_conv",
                           **kw)(x, train)
        feats.append(x)
        for i in range(1, 5):
            x = max_pool(x)
            x = ConvBlockLeaky(FEATURES[i], ENC_DROPOUT[i],
                               name=f"down{i}", **kw)(x, train)
            feats.append(x)
        return feats


class UpBlock2D(nn.Module):
    """1x1 conv + bilinear(align_corners) up + concat(skip, up) +
    ConvBlockReLU (unet.py:162-184 with default bilinear=True)."""

    mid: int
    out: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        x1 = HConv(self.mid, kernel_size=1, name="conv1x1", **kw)(x1, train)
        x1 = resize_linear_align_corners(x1, x2.shape[1:-1])
        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBlockReLU(self.out, name="conv", **kw)(x, train)


def _decoder(parent_kw, feats, train, prefix=""):
    """Shared 4-UpBlock decode (DecoderLeaky.forward, unet.py:293-303)."""
    x0, x1, x2, x3, x4 = feats
    x = UpBlock2D(FEATURES[3], FEATURES[3], name=prefix + "up1",
                  **parent_kw)(x4, x3, train)
    x = UpBlock2D(FEATURES[2], FEATURES[2], name=prefix + "up2",
                  **parent_kw)(x, x2, train)
    x = UpBlock2D(FEATURES[1], FEATURES[1], name=prefix + "up3",
                  **parent_kw)(x, x1, train)
    x = UpBlock2D(FEATURES[0], FEATURES[0], name=prefix + "up4",
                  **parent_kw)(x, x0, train)
    return x


class Decoder2D(nn.Module):
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        return _decoder(kw, feats, train)


class MLPHead(nn.Module):
    """3-conv segmentation head with ReLU+Dropout(0.5) (unet.py:449-455);
    single-conv when multiple_layers=False."""

    n_cls: int
    kernel: int = 3
    multiple_layers: bool = True
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(kernel_size=self.kernel, padding=self.kernel // 2,
                  hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        if not self.multiple_layers:
            return HConv(self.n_cls, name="conv_out", **kw)(x, train)
        ch = x.shape[-1]
        x = HConv(ch * 4, name="conv1", **kw)(x, train)
        x = FastDropout(0.5, deterministic=not train)(nn.relu(x))
        x = HConv(ch * 2, name="conv2", **kw)(x, train)
        x = FastDropout(0.5, deterministic=not train)(nn.relu(x))
        return HConv(self.n_cls, name="conv_out", **kw)(x, train)


class UNet2D(nn.Module):
    """The flagship 2D model (UNet_Transposed_Leaky, unet.py:423-478)."""

    in_channels: int
    n_cls: int
    linear_probe: bool = False
    multiple_layers: bool = True
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    def _kw(self):
        return dict(hebb=self.hebb, init_type=self.init_type,
                    dtype=self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = self._kw()
        feats = Encoder2D(name="encoder", **kw)(x, train)
        dec = Decoder2D(name="main_decoder", **kw)(feats, train)
        return MLPHead(self.n_cls, 1 if self.linear_probe else 3,
                       self.multiple_layers, name="out_conv",
                       **kw)(dec, train)


class UNetURPC2D(nn.Module):
    """Multi-scale deep supervision: 4 heads, lower scales nearest-
    upsampled to input size (unet_urpc.py:201-264)."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        ckw = dict(kernel_size=3, padding=1, **kw)
        shape = x.shape[1:-1]
        x0, x1, x2, x3, x4 = Encoder2D(name="encoder", **kw)(x, train)
        up = UpBlock2D(FEATURES[3], FEATURES[3], name="up1", **kw)(
            x4, x3, train)
        dp3 = HConv(self.n_cls, name="out_conv_dp3", **ckw)(up, train)
        dp3 = resize_nearest_torch(dp3, shape)
        up = UpBlock2D(FEATURES[2], FEATURES[2], name="up2", **kw)(
            up, x2, train)
        dp2 = HConv(self.n_cls, name="out_conv_dp2", **ckw)(up, train)
        dp2 = resize_nearest_torch(dp2, shape)
        up = UpBlock2D(FEATURES[1], FEATURES[1], name="up3", **kw)(
            up, x1, train)
        dp1 = HConv(self.n_cls, name="out_conv_dp1", **ckw)(up, train)
        dp1 = resize_nearest_torch(dp1, shape)
        up = UpBlock2D(FEATURES[0], FEATURES[0], name="up4", **kw)(
            up, x0, train)
        dp0 = HConv(self.n_cls, name="out_conv", **ckw)(up, train)
        return dp0, dp1, dp2, dp3


class UNetCCT2D(nn.Module):
    """Shared decoder run on clean + 3 perturbed encoder feature sets
    (unet_cct.py:184-267).  Perturbations need the 'perturb' rng; without
    it the aux outputs equal the main output (reference perturbs
    unconditionally, but only training consumes aux heads)."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        feats = Encoder2D(name="encoder", **kw)(x, train)
        # One shared decoder + head, invoked per perturbation
        # (unet_cct.py:200-212: up1..up4/out_conv reused for all passes).
        ups = [UpBlock2D(FEATURES[i], FEATURES[i], name=f"up{4 - i}", **kw)
               for i in (3, 2, 1, 0)]
        head = HConv(self.n_cls, kernel_size=3, padding=1,
                     name="out_conv", **kw)

        def decode(f):
            x0, x1, x2, x3, x4 = f
            d = ups[0](x4, x3, train)
            d = ups[1](d, x2, train)
            d = ups[2](d, x1, train)
            d = ups[3](d, x0, train)
            return head(d, train)

        main = decode(feats)
        if self.has_rng("perturb"):
            keys = jax.random.split(self.make_rng("perturb"), 3)
            aux1 = decode(perturb_features(keys[0], feats, "noise"))
            aux2 = decode(perturb_features(keys[1], feats, "dropout"))
            aux3 = decode(perturb_features(keys[2], feats, "feature_dropout"))
        else:
            aux1 = aux2 = aux3 = main
        return main, aux1, aux2, aux3


class UNetVAE2D(nn.Module):
    """Backbone + 1x1 mu/var on the bottleneck, reparameterized latent into
    the decoder; seg + reconstruction heads (unet_vae.py:202-280).
    Requires the 'latent' rng for the reparameterization sample."""

    in_channels: int
    n_cls: int
    linear_probe: bool = True
    multiple_layers: bool = True
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        feats = Encoder2D(name="encoder", **kw)(x, train)
        mu = HConv(256, kernel_size=1, name="mu", **kw)(feats[-1], train)
        log_var = HConv(256, kernel_size=1, name="var", **kw)(
            feats[-1], train)
        std = jnp.exp(0.5 * log_var)
        eps = (jax.random.normal(self.make_rng("latent"), std.shape,
                                 std.dtype)
               if self.has_rng("latent") else jnp.zeros_like(std))
        latent = eps * std + mu
        dec = Decoder2D(name="main_decoder", **kw)(
            feats[:4] + [latent], train)
        seg = MLPHead(self.n_cls, 1 if self.linear_probe else 3,
                      self.multiple_layers, name="out_conv", **kw)(dec, train)
        reconstr = HConv(self.in_channels, kernel_size=1, name="reconstr",
                         **kw)(dec, train)
        return {"output": seg, "mu": mu, "log_var": log_var,
                "reconstr": reconstr}


class UNetSuperpix2D(nn.Module):
    """Backbone + 1x1 seg head + 2-class superpixel head
    (unet_superpix.py:200-262; defaults linear_probe=True,
    multiple_layers=False -> single 1x1 out_conv)."""

    in_channels: int
    n_cls: int
    linear_probe: bool = True
    multiple_layers: bool = False
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        feats = Encoder2D(name="encoder", **kw)(x, train)
        dec = Decoder2D(name="main_decoder", **kw)(feats, train)
        seg = MLPHead(self.n_cls, 1 if self.linear_probe else 3,
                      self.multiple_layers, name="out_conv", **kw)(dec, train)
        sp = HConv(2, kernel_size=1, name="out_superpix", **kw)(dec, train)
        return seg, sp
