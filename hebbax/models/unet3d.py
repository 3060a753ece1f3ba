"""3D UNet family (reference: models/networks_3d/unet3d.py:31-243,
unet3d_dtc.py:32-145, unet3d_cct.py:125-301, unet3d_superpix.py:31-139).

Classic 3D U-Net: double conv3-BN-ReLU blocks, maxpool2 downs,
ConvTranspose3d(k=2,s=2) ups with skip concat, init_features=64
(1024-channel bottleneck).  Variants differ only in heads / decoder
perturbation, mirroring the reference exactly.

TPU-native: channels-last NDHWC, HConv/HConvTranspose everywhere so a
static HebbSpec turns any variant Hebbian without surgery.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..hebb.layers import HConv, HConvTranspose
from ..hebb.spec import HebbSpec
from .common import max_pool, perturb_features


class Block3D(nn.Module):
    """conv3-BN-ReLU x2 (UNet3D._block, unet3d.py:96-126).  torch
    BatchNorm3d keeps its default ones init (the reference's init_weights
    only rescales BatchNorm2d)."""

    features: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(kernel_size=(3, 3, 3), padding=1, hebb=self.hebb,
                  init_type=self.init_type, dtype=self.dtype)
        for i in (1, 2):
            x = HConv(self.features, name=f"conv{i}", **kw)(x, train)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"norm{i}")(x)
            x = nn.relu(x)
        return x


class Encoder3D(nn.Module):
    """encoder1..4 + bottleneck with maxpool2 between (unet3d.py:40-80)."""

    features: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        f = self.features
        feats = []
        for i, ch in enumerate((f, f * 2, f * 4, f * 8)):
            if i:
                x = max_pool(x)
            x = Block3D(ch, name=f"encoder{i + 1}", **kw)(x, train)
            feats.append(x)
        x = Block3D(f * 16, name="bottleneck", **kw)(max_pool(x), train)
        return feats, x


class Decoder3D(nn.Module):
    """upconvN (transpose k=2 s=2) + concat(skip) + Block3D, 4 levels,
    returning pre-head features (unet3d.py:52-92, unet3d_cct.py:57-92)."""

    features: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, bottleneck, feats, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        f = self.features
        x = bottleneck
        for i, ch in zip((4, 3, 2, 1), (f * 8, f * 4, f * 2, f)):
            x = HConvTranspose(ch, kernel_size=(2, 2, 2), strides=2,
                               name=f"upconv{i}", **kw)(x, train)
            x = jnp.concatenate([x, feats[i - 1]], axis=-1)
            x = Block3D(ch, name=f"decoder{i}", **kw)(x, train)
        return x


class UNet3D(nn.Module):
    """Plain 3D U-Net with 1x1x1 head 'conv' (unet3d.py:31-126);
    init_features=64 ('unet3d'), 32 for the _min variant."""

    in_channels: int
    n_cls: int
    init_features: int = 64
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        feats, bottleneck = Encoder3D(self.init_features, name="encoder",
                                      **kw)(x, train)
        dec = Decoder3D(self.init_features, name="decoder", **kw)(
            bottleneck, feats, train)
        return HConv(self.n_cls, kernel_size=(1, 1, 1), name="conv",
                     **kw)(dec, train)


class UNet3DDTC(nn.Module):
    """Dual-task heads: tanh SDF regression + segmentation
    (unet3d_dtc.py:61-98)."""

    in_channels: int
    n_cls: int
    init_features: int = 64
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        feats, bottleneck = Encoder3D(self.init_features, name="encoder",
                                      **kw)(x, train)
        dec = Decoder3D(self.init_features, name="decoder", **kw)(
            bottleneck, feats, train)
        sdf = jnp.tanh(HConv(self.n_cls, kernel_size=(1, 1, 1),
                             name="out_sdf", **kw)(dec, train))
        seg = HConv(self.n_cls, kernel_size=(1, 1, 1), name="out_seg",
                    **kw)(dec, train)
        return sdf, seg


class UNet3DCCT(nn.Module):
    """Shared decoder over clean + noise/dropout/feature-dropout perturbed
    encoder features, shared 1x1x1 head (unet3d_cct.py:125-174)."""

    in_channels: int
    n_cls: int
    init_features: int = 64
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None
    # None = full remat; "convs" = save conv outputs, recompute only
    # the elementwise tail in backward (models/common.remat_policy)
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .common import remat_policy

        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        feats, bottleneck = Encoder3D(self.init_features, name="encoder",
                                      **kw)(x, train)
        # remat: the shared decoder runs 4x per forward (8x per semi
        # step with the unsup batch); storing all passes' activations
        # for backward exceeds the v5e's 16G HBM at the reference
        # 96x96x80 patch (measured: 16.88G requested).  Recompute them
        # in the backward instead — params/grads unchanged.
        decoder = nn.remat(Decoder3D, static_argnums=(3,),
                           policy=remat_policy(self.remat_policy))(
            self.init_features, name="main_decoder", **kw)
        head = HConv(self.n_cls, kernel_size=(1, 1, 1), name="conv", **kw)

        def decode(b, f):
            return head(decoder(b, f, train), train)

        main = decode(bottleneck, feats)
        if self.has_rng("perturb"):
            keys = jax.random.split(self.make_rng("perturb"), 3)
            all_feats = feats + [bottleneck]
            pert = [perturb_features(k, all_feats, kind)
                    for k, kind in zip(keys,
                                       ("noise", "dropout",
                                        "feature_dropout"))]
            aux = [decode(p[-1], p[:4]) for p in pert]
        else:
            aux = [main, main, main]
        return (main, *aux)


class UNet3DVAE(nn.Module):
    """3D analog of the 2D VAE variant (unet_vae.py:202-270): 1x1x1 mu/var
    on the bottleneck, reparameterized latent into the decoder, seg +
    reconstruction heads.  The reference registers 'unet3d_vae'
    (getnetwork.py:32-33) but never ships the model — this makes the
    path functional."""

    in_channels: int
    n_cls: int
    init_features: int = 64
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        f = self.init_features
        feats, bottleneck = Encoder3D(f, name="encoder", **kw)(x, train)
        mu = HConv(f * 16, kernel_size=(1, 1, 1), name="mu", **kw)(
            bottleneck, train)
        log_var = HConv(f * 16, kernel_size=(1, 1, 1), name="var", **kw)(
            bottleneck, train)
        std = jnp.exp(0.5 * log_var)
        eps = (jax.random.normal(self.make_rng("latent"), std.shape,
                                 std.dtype)
               if self.has_rng("latent") else jnp.zeros_like(std))
        latent = eps * std + mu
        dec = Decoder3D(f, name="decoder", **kw)(latent, feats, train)
        seg = HConv(self.n_cls, kernel_size=(1, 1, 1), name="conv",
                    **kw)(dec, train)
        reconstr = HConv(self.in_channels, kernel_size=(1, 1, 1),
                         name="reconstr", **kw)(dec, train)
        return {"output": seg, "mu": mu, "log_var": log_var,
                "reconstr": reconstr}


class UNet3DSuperpix(nn.Module):
    """UNet3D + 2-class superpixel head (unet3d_superpix.py:31-95)."""

    in_channels: int
    n_cls: int
    init_features: int = 64
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        feats, bottleneck = Encoder3D(self.init_features, name="encoder",
                                      **kw)(x, train)
        dec = Decoder3D(self.init_features, name="decoder", **kw)(
            bottleneck, feats, train)
        seg = HConv(self.n_cls, kernel_size=(1, 1, 1), name="conv",
                    **kw)(dec, train)
        sp = HConv(2, kernel_size=(1, 1, 1), name="out_superpix",
                   **kw)(dec, train)
        return seg, sp
