"""Space-to-depth folded unet3d_urpc — TPU fast path for the 3D URPC
semi-supervised protocol net.

Same math / parameter tree / checkpoints as :class:`~hebbax.models.
urpc3d.UNet3DURPC` (reference: models/networks_3d/unet3d_urpc.py:
108-202); only the compute layout of the top two pyramid levels
differs.  FILTERS start at C=16 with 3^3 convs at 96x96x80 — the
128-lane MXU's worst case (8x lane padding; the 2D analogue measured
~50x off peak).  Levels 1 (C=16 @full) and 2 (C=32 @half) run folded
at (2,2,2): 4x FLOPs at >=8x better lane occupancy; the 2x2x2 maxpool
doubles as the unfold at level transitions (s2d3d.subpixel_max3).

Exactness vs the unfolded model is asserted in
tests/test_urpc3d_s2d.py.  Select with ``--network unet3d_urpc_s2d`` —
checkpoints interchangeable with ``unet3d_urpc``.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..hebb.layers import FoldedHConv3, HConv
from ..hebb.spec import HebbSpec
from ..ops import s2d3d
from .common import max_pool, resize_linear_align_corners
from .urpc3d import FILTERS, UnetConv3, UnetUp3CT

FOLD = (2, 2, 2)
PF = 8


def folded_instance_norm(x, pf, eps: float = 1e-5):
    """instance_norm (common.py:87-93) per ORIGINAL channel on a folded
    tensor: per-sample stats over spatial dims AND the subpixel
    blocks."""
    xg = x.reshape(x.shape[:-1] + (pf, x.shape[-1] // pf))
    axes = (1, 2, 3, 4)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    return ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)


class FoldedUnetConv3(nn.Module):
    """UnetConv3 (unet3d_urpc.py:31-56) on folded tensors; same param
    tree (conv1/conv2)."""

    features: int
    in_groups: Sequence[int]
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(fold=FOLD, hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        groups = tuple(self.in_groups)
        for i in (1, 2):
            x = FoldedHConv3(self.features, 3, groups,
                             name=f"conv{i}", **kw)(x, train)
            x = nn.relu(folded_instance_norm(x, PF))
            groups = (self.features,)
        return x


class FoldedUnetUp3CT(nn.Module):
    """UnetUp3CT (unet3d_urpc.py:81-97) whose conv runs folded: the
    trilinear 2x upsample runs in the ORIGINAL layout (exact parity),
    its result is folded and concatenated with the FOLDED skip.  Same
    param tree (conv/conv1, conv/conv2)."""

    features: int
    skip_ch: int
    x_ch: int
    x_folded: bool
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, skip_f, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        if self.x_folded:
            x = s2d3d.unfold3(x, FOLD)
        out_spatial = tuple(2 * s for s in skip_f.shape[1:4])
        x = resize_linear_align_corners(x, out_spatial)
        cat = jnp.concatenate([skip_f, s2d3d.fold3(x, FOLD)], axis=-1)
        return FoldedUnetConv3(self.features,
                               (self.skip_ch, self.x_ch),
                               name="conv", **kw)(cat, train)


class UNet3DURPCS2D(nn.Module):
    """UNet3DURPC with the top two levels folded (see module doc)."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        shape = x.shape[1:-1]
        in_ch = x.shape[-1]
        # encoder: levels 1-2 folded, 3-4 + center unchanged
        x1f = FoldedUnetConv3(FILTERS[0], (in_ch,), name="conv1",
                              **kw)(s2d3d.fold3(x, FOLD), train)
        h1 = s2d3d.subpixel_max3(x1f, FOLD)            # unfolded @half
        x2f = FoldedUnetConv3(FILTERS[1], (FILTERS[0],), name="conv2",
                              **kw)(s2d3d.fold3(h1, FOLD), train)
        h2 = s2d3d.subpixel_max3(x2f, FOLD)            # unfolded @quart
        x3 = UnetConv3(FILTERS[2], name="conv3", **kw)(h2, train)
        x4 = UnetConv3(FILTERS[3], name="conv4", **kw)(max_pool(x3),
                                                       train)
        center = UnetConv3(FILTERS[4], name="center", **kw)(
            max_pool(x4), train)

        def drop(p, v):
            return nn.Dropout(p, broadcast_dims=(1, 2, 3),
                              deterministic=not train)(v)

        def drop_folded(p, v):
            # per (N, ORIGINAL channel) on the (..., PF, C) view
            vg = v.reshape(v.shape[:-1] + (PF, v.shape[-1] // PF))
            vg = nn.Dropout(p, broadcast_dims=(1, 2, 3, 4),
                            deterministic=not train)(vg)
            return vg.reshape(v.shape)

        up4 = drop(0.5, UnetUp3CT(FILTERS[3], name="up_concat4", **kw)(
            x4, center, train))
        up3 = drop(0.3, UnetUp3CT(FILTERS[2], name="up_concat3", **kw)(
            x3, up4, train))
        up2 = drop_folded(0.2, FoldedUnetUp3CT(
            FILTERS[1], FILTERS[1], FILTERS[2], x_folded=False,
            name="up_concat2", **kw)(x2f, up3, train))
        up1 = drop_folded(0.1, FoldedUnetUp3CT(
            FILTERS[0], FILTERS[0], FILTERS[1], x_folded=True,
            name="up_concat1", **kw)(x1f, up2, train))

        ckw = dict(kernel_size=(1, 1, 1), **kw)
        fkw = dict(fold=FOLD, hebb=self.hebb, init_type=self.init_type,
                   dtype=self.dtype)
        dsv4 = resize_linear_align_corners(
            HConv(self.n_cls, name="dsv4", **ckw)(up4, train), shape)
        dsv3 = resize_linear_align_corners(
            HConv(self.n_cls, name="dsv3", **ckw)(up3, train), shape)
        dsv2 = resize_linear_align_corners(
            s2d3d.unfold3(FoldedHConv3(self.n_cls, 1, (FILTERS[1],),
                                       name="dsv2", **fkw)(up2, train),
                          FOLD), shape)
        dsv1 = s2d3d.unfold3(
            FoldedHConv3(self.n_cls, 1, (FILTERS[0],),
                         name="dsv1", **fkw)(up1, train), FOLD)
        return dsv1, dsv2, dsv3, dsv4
