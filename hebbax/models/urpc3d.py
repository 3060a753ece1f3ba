"""3D URPC model — attention-free 3D UNet with deep supervision
(reference: models/networks_3d/unet3d_urpc.py:31-220, unet_3D_dv_semi).

Channels [16,32,64,128,256] (filters/feature_scale=4), double
conv3-InstanceNorm-ReLU blocks, trilinear(align_corners) upsampling with
skip concat, Dropout3d(.5/.3/.2/.1) on the four decode levels, and four
deep-supervision heads (1x1 conv + trilinear up to full size).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..hebb.layers import HConv
from ..hebb.spec import HebbSpec
from .common import instance_norm, max_pool, resize_linear_align_corners

FILTERS = (16, 32, 64, 128, 256)


class UnetConv3(nn.Module):
    """conv3x3x3-InstanceNorm-ReLU x2 (unet3d_urpc.py:31-56;
    is_batchnorm=True actually instantiates InstanceNorm3d)."""

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
            x = nn.relu(instance_norm(x))
        return x


class UnetUp3CT(nn.Module):
    """trilinear 2x (align_corners) upsample + concat + UnetConv3
    (unet3d_urpc.py:81-97)."""

    features: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        x = resize_linear_align_corners(x, skip.shape[1:-1])
        x = jnp.concatenate([skip, x], axis=-1)
        return UnetConv3(self.features, name="conv", **kw)(x, train)


class UNet3DURPC(nn.Module):
    """unet_3D_dv_semi (unet3d_urpc.py:108-202): returns
    (dsv1, dsv2, dsv3, dsv4) full-resolution logits."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type, dtype=self.dtype)
        shape = x.shape[1:-1]
        feats = []
        for i, ch in enumerate(FILTERS[:4]):
            if i:
                x = max_pool(x)
            x = UnetConv3(ch, name=f"conv{i + 1}", **kw)(x, train)
            feats.append(x)
        center = UnetConv3(FILTERS[4], name="center", **kw)(
            max_pool(x), train)

        drop = lambda p, v: nn.Dropout(
            p, broadcast_dims=(1, 2, 3),
            deterministic=not train)(v)  # Dropout3d: whole-channel drops
        up4 = drop(0.5, UnetUp3CT(FILTERS[3], name="up_concat4", **kw)(
            feats[3], center, train))
        up3 = drop(0.3, UnetUp3CT(FILTERS[2], name="up_concat3", **kw)(
            feats[2], up4, train))
        up2 = drop(0.2, UnetUp3CT(FILTERS[1], name="up_concat2", **kw)(
            feats[1], up3, train))
        up1 = drop(0.1, UnetUp3CT(FILTERS[0], name="up_concat1", **kw)(
            feats[0], up2, train))

        ckw = dict(kernel_size=(1, 1, 1), **kw)
        dsv4 = resize_linear_align_corners(
            HConv(self.n_cls, name="dsv4", **ckw)(up4, train), shape)
        dsv3 = resize_linear_align_corners(
            HConv(self.n_cls, name="dsv3", **ckw)(up3, train), shape)
        dsv2 = resize_linear_align_corners(
            HConv(self.n_cls, name="dsv2", **ckw)(up2, train), shape)
        dsv1 = HConv(self.n_cls, name="dsv1", **ckw)(up1, train)
        return dsv1, dsv2, dsv3, dsv4
