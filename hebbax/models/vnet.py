"""V-Net (reference: models/networks_3d/vnet.py:44-195).

InputTransition(16) with input-broadcast residual; Down transitions
(strided conv k2 s2 doubling channels) with residual LUConv(conv5-BN-ELU)
stacks; Up transitions (transpose conv k2 s2 halving to out/2, concat with
channel-dropped skip) with residual stacks; OutputTransition
(conv5 -> BN -> ELU -> conv1).  ELU activations (factory elu=True).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..hebb.layers import HConv, HConvTranspose
from ..hebb.spec import HebbSpec


def _bn(parent_unused, x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)(x)


class LUConvStack(nn.Module):
    """n x (conv5-BN-ELU) at constant width (vnet.py:44-61)."""

    features: int
    n: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n):
            x = HConv(self.features, kernel_size=(5, 5, 5), padding=2,
                      hebb=self.hebb, init_type=self.init_type,
                      dtype=self.dtype, name=f"conv{i + 1}")(x, train)
            x = _bn(self, x, train, f"bn{i + 1}", self.dtype)
            x = nn.elu(x)
        return x


class InputTransition(nn.Module):
    """conv5 -> BN, residual add of the input broadcast to 16 channels,
    ELU (vnet.py:64-82)."""

    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = HConv(16, kernel_size=(5, 5, 5), padding=2, hebb=self.hebb,
                    init_type=self.init_type, dtype=self.dtype,
                    name="conv1")(x, train)
        out = _bn(self, out, train, "bn1", self.dtype)
        x16 = jnp.tile(x, (1,) * (x.ndim - 1) + (16 // x.shape[-1],))
        return nn.elu(out + x16)


class DownTransition(nn.Module):
    """strided conv k2 s2 doubling channels -> BN -> ELU, then a residual
    LUConv stack (vnet.py:85-104)."""

    out_features: int
    n_convs: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        down = HConv(self.out_features, kernel_size=(2, 2, 2), strides=2,
                     name="down_conv", **kw)(x, train)
        down = nn.elu(_bn(self, down, train, "bn1", self.dtype))
        out = LUConvStack(self.out_features, self.n_convs, name="ops",
                          **kw)(down, train)
        return nn.elu(out + down)


class UpTransition(nn.Module):
    """transpose conv k2 s2 to out/2 -> BN -> ELU, concat with Dropout3d'd
    skip, residual LUConv stack (vnet.py:107-128)."""

    out_features: int
    n_convs: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        skip = nn.Dropout(0.5, broadcast_dims=(1, 2, 3),
                          deterministic=not train)(skip)
        up = HConvTranspose(self.out_features // 2, kernel_size=(2, 2, 2),
                            strides=2, name="up_conv", **kw)(x, train)
        up = nn.elu(_bn(self, up, train, "bn1", self.dtype))
        xcat = jnp.concatenate([up, skip], axis=-1)
        out = LUConvStack(self.out_features, self.n_convs, name="ops",
                          **kw)(xcat, train)
        return nn.elu(out + xcat)


class OutputTransition(nn.Module):
    """conv5 -> BN -> ELU -> conv1 head (vnet.py:131-146)."""

    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        out = HConv(self.n_cls, kernel_size=(5, 5, 5), padding=2,
                    name="conv1", **kw)(x, train)
        out = nn.elu(_bn(self, out, train, "bn1", self.dtype))
        return HConv(self.n_cls, kernel_size=(1, 1, 1), name="conv2",
                     **kw)(out, train)


class VNet(nn.Module):
    """VNet (vnet.py:147-179)."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        out16 = InputTransition(name="in_tr", **kw)(x, train)
        out32 = DownTransition(32, 1, name="down_tr32", **kw)(out16, train)
        out64 = DownTransition(64, 2, name="down_tr64", **kw)(out32, train)
        out128 = DownTransition(128, 3, name="down_tr128", **kw)(out64, train)
        out256 = DownTransition(256, 2, name="down_tr256", **kw)(out128,
                                                                 train)
        out = UpTransition(256, 2, name="up_tr256", **kw)(out256, out128,
                                                          train)
        out = UpTransition(128, 2, name="up_tr128", **kw)(out, out64, train)
        out = UpTransition(64, 1, name="up_tr64", **kw)(out, out32, train)
        out = UpTransition(32, 1, name="up_tr32", **kw)(out, out16, train)
        return OutputTransition(self.n_cls, name="out_tr", **kw)(out, train)


class VNetDecoder(nn.Module):
    """Shared VNet decode path (vnet_cct.py:177-195)."""

    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, out256, out128, out64, out32, out16,
                 train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        out = UpTransition(256, 2, name="up_tr256", **kw)(out256, out128,
                                                          train)
        out = UpTransition(128, 2, name="up_tr128", **kw)(out, out64, train)
        out = UpTransition(64, 1, name="up_tr64", **kw)(out, out32, train)
        out = UpTransition(32, 1, name="up_tr32", **kw)(out, out16, train)
        return OutputTransition(self.n_cls, name="out_tr", **kw)(out, train)


class VNetCCT(nn.Module):
    """VNet trunk, shared decoder run on clean + perturbed encoder
    features (vnet_cct.py:195-232; like the reference, the aux decoders
    exist but the main decoder serves all four passes)."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None
    # None = full remat; "convs" = save conv outputs, recompute only
    # the elementwise tail in backward (models/common.remat_policy)
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax

        from .common import perturb_features, remat_policy
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        out16 = InputTransition(name="in_tr", **kw)(x, train)
        out32 = DownTransition(32, 1, name="down_tr32", **kw)(out16, train)
        out64 = DownTransition(64, 2, name="down_tr64", **kw)(out32, train)
        out128 = DownTransition(128, 3, name="down_tr128", **kw)(out64,
                                                                 train)
        out256 = DownTransition(256, 2, name="down_tr256", **kw)(out128,
                                                                 train)
        # remat: 4 shared-decoder passes/forward OOM the 16G HBM at the
        # reference patch size (see UNet3DCCT); recompute in backward
        decoder = nn.remat(VNetDecoder, static_argnums=(6,),
                           policy=remat_policy(self.remat_policy))(
            self.n_cls, name="main_decoder", **kw)
        feats = [out256, out128, out64, out32, out16]
        main = decoder(*feats, train)
        if self.has_rng("perturb"):
            keys = jax.random.split(self.make_rng("perturb"), 3)
            aux = [decoder(*perturb_features(k, feats, kind), train)
                   for k, kind in zip(keys, ("noise", "dropout",
                                             "feature_dropout"))]
        else:
            aux = [main, main, main]
        return (main, *aux)


class VNetDTC(nn.Module):
    """VNet trunk with dual SDF (tanh) + seg heads, mirroring the
    reference's VNet_DTC (vnet_dtc.py:148-190: out_tr replaced by two
    OutputTransition-style heads)."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        out16 = InputTransition(name="in_tr", **kw)(x, train)
        out32 = DownTransition(32, 1, name="down_tr32", **kw)(out16, train)
        out64 = DownTransition(64, 2, name="down_tr64", **kw)(out32, train)
        out128 = DownTransition(128, 3, name="down_tr128", **kw)(out64, train)
        out256 = DownTransition(256, 2, name="down_tr256", **kw)(out128,
                                                                 train)
        out = UpTransition(256, 2, name="up_tr256", **kw)(out256, out128,
                                                          train)
        out = UpTransition(128, 2, name="up_tr128", **kw)(out, out64, train)
        out = UpTransition(64, 1, name="up_tr64", **kw)(out, out32, train)
        out = UpTransition(32, 1, name="up_tr32", **kw)(out, out16, train)
        sdf = jnp.tanh(OutputTransition(self.n_cls, name="out_sdf",
                                        **kw)(out, train))
        seg = OutputTransition(self.n_cls, name="out_seg", **kw)(out, train)
        return sdf, seg
