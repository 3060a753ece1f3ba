"""Space-to-depth folded 3D UNet — the TPU-fast 3D variant.

Same math, same parameter tree, same checkpoints as
:class:`~hebbax.models.unet3d.UNet3D` (reference contract:
models/networks_3d/unet3d.py:31-126); only the COMPUTE LAYOUT of the
full-resolution level differs.  The profiled 101 ms bf16 train step
spends over half its time OUTSIDE convolutions — elementwise loop
fusions (28.6 ms) and data-formatting relayouts (18.9 ms) concentrated
at the (96,96,80) C=64 level, where bf16 arrays pad the 128-lane tile
2x (a single full-res relu measured 9.5 ms).  Folding the depth axis
2x into channels (ops/s2d3d.py, factors (2,1,1) -> C=128) makes every
level-0 tensor exactly lane-dense:

  * the two encoder1 / two decoder1 3x3x3 convs run 2x FLOPs at a
    measured ~125 vs ~46 TF/s (scripts/microbench_conv3d.py) — a 1.35x
    conv win, and all their elementwise/BN/relu/concat neighbours
    become dense;
  * upconv1 (k=2/s=2 transpose) emits the folded layout for FREE — the
    z tap absorbs into output channel blocks and the op becomes a
    dense matmul (s2d3d.fold_transpose_kernel3);
  * the 2x2x2 maxpool doubles as the unfold at the level transition
    (s2d3d.subpixel_max3).

Exact f32 equivalence with UNet3D (eval outputs, Hebbian deltas, BN
batch stats) is asserted in tests/test_unet3d_s2d.py.  Select with
``-n unet3d_s2d`` — checkpoints are interchangeable with ``unet3d`` in
both directions.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..hebb.layers import FoldedHConv3, FoldedHConvTranspose3
from ..hebb.spec import HebbSpec
from ..ops import s2d3d
from .common import max_pool
from .unet3d import Block3D

FOLD = (2, 1, 1)


class FoldedBatchNorm3(nn.Module):
    """flax.linen.BatchNorm semantics computed on a FOLDED 3D tensor.

    Stats are per ORIGINAL channel — over (N, spatial) and the prod(f)
    subpixel blocks — so params/stats are (C,) exactly like the
    unfolded model's BatchNorm (same names: scale/bias, mean/var)."""

    pf: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    # when the folded input is in grouped-concat order (out_groups of
    # FoldedHConv3 / a folded concat), give the group sizes here; the
    # (c,) params/stats stay in original channel order (= group-major)
    groups: Optional[Sequence[int]] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1] // self.pf
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (c,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (c,))

        groups = (tuple(self.groups) if self.groups is not None
                  else (c,))
        assert sum(groups) == c, (groups, c)
        views, off = [], 0
        for g in groups:
            views.append(x[..., off:off + self.pf * g].reshape(
                x.shape[:-1] + (self.pf, g)))
            off += self.pf * g
        if train:
            # promote (not hard-cast) so x64 tests stay exact; equals
            # f32 for the f32/bf16 production paths like flax BatchNorm
            means, mean2s = [], []
            for xgp in views:
                xs = xgp.astype(jnp.promote_types(jnp.float32, x.dtype))
                axes = tuple(range(xs.ndim - 1))
                means.append(jnp.mean(xs, axis=axes))
                mean2s.append(jnp.mean(jax.lax.square(xs), axis=axes))
            mean = jnp.concatenate(means)
            mean2 = jnp.concatenate(mean2s)
            var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        dtype = self.dtype or x.dtype
        outs, off = [], 0
        for xgp, g in zip(views, groups):
            sl = slice(off, off + g)
            y = (xgp - mean[sl].astype(dtype)) * jax.lax.rsqrt(
                var[sl].astype(dtype) + jnp.asarray(self.epsilon, dtype))
            y = y * scale[sl].astype(dtype) + bias[sl].astype(dtype)
            outs.append(y.reshape(x.shape[:-1] + (self.pf * g,)))
            off += g
        return (outs[0] if len(outs) == 1
                else jnp.concatenate(outs, axis=-1))


class FoldedBlock3D(nn.Module):
    """Block3D (unet3d.py:96-126) on folded tensors; same param tree
    (conv1/norm1/conv2/norm2)."""

    features: int
    in_groups: Sequence[int]
    fold: Sequence[int] = FOLD
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pf = s2d3d.prodf(self.fold)
        kw = dict(fold=self.fold, hebb=self.hebb,
                  init_type=self.init_type, dtype=self.dtype)
        x = FoldedHConv3(self.features, 3, tuple(self.in_groups),
                         name="conv1", **kw)(x, train)
        x = FoldedBatchNorm3(pf, dtype=self.dtype, name="norm1")(x, train)
        x = nn.relu(x)
        x = FoldedHConv3(self.features, 3, (self.features,),
                         name="conv2", **kw)(x, train)
        x = FoldedBatchNorm3(pf, dtype=self.dtype, name="norm2")(x, train)
        return nn.relu(x)


class FoldedEncoder3D(nn.Module):
    """Encoder3D with level 0 folded.  feats[0] is returned FOLDED (its
    consumer — the folded decoder1 block — concats in folded layout);
    feats[1..3] and the bottleneck are byte-identical to Encoder3D."""

    features: int
    fold: Sequence[int] = FOLD
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        f = self.features
        in_ch = x.shape[-1]
        xf = s2d3d.fold3(x, self.fold)
        x0 = FoldedBlock3D(f, (in_ch,), fold=self.fold,
                           name="encoder1", **kw)(xf, train)
        feats = [x0]                                   # folded f@full
        xk = s2d3d.subpixel_max3(x0, self.fold)        # unfolded f@half
        for i, ch in ((2, f * 2), (3, f * 4), (4, f * 8)):
            if i > 2:
                xk = max_pool(xk)
            xk = Block3D(ch, name=f"encoder{i}", **kw)(xk, train)
            feats.append(xk)
        bott = Block3D(f * 16, name="bottleneck", **kw)(max_pool(xk),
                                                        train)
        return feats, bott


class FoldedDecoder3D(nn.Module):
    """Decoder3D with upconv1/decoder1 folded; param paths match
    decoder/upconv{4..1}, decoder/decoder{4..1} exactly.  Returns the
    FOLDED pre-head features."""

    features: int
    fold: Sequence[int] = FOLD
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, bottleneck, feats, train: bool = False):
        from ..hebb.layers import HConvTranspose

        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        f = self.features
        x = bottleneck
        for i, ch in zip((4, 3, 2), (f * 8, f * 4, f * 2)):
            x = HConvTranspose(ch, kernel_size=(2, 2, 2), strides=2,
                               name=f"upconv{i}", **kw)(x, train)
            x = jnp.concatenate([x, feats[i - 1]], axis=-1)
            x = Block3D(ch, name=f"decoder{i}", **kw)(x, train)
        xf = FoldedHConvTranspose3(f, fold=self.fold, name="upconv1",
                                   **kw)(x, train)
        xf = jnp.concatenate([xf, feats[0]], axis=-1)
        return FoldedBlock3D(f, (f, f), fold=self.fold, name="decoder1",
                             **kw)(xf, train)


class UNet3DS2D(nn.Module):
    """UNet3D with a space-to-depth folded full-resolution level (see
    module doc).  Identical parameter tree / checkpoints to 'unet3d'."""

    in_channels: int
    n_cls: int
    init_features: int = 64
    fold: Sequence[int] = FOLD
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(fold=self.fold, hebb=self.hebb,
                  init_type=self.init_type, dtype=self.dtype)
        feats, bottleneck = FoldedEncoder3D(self.init_features,
                                            name="encoder",
                                            **kw)(x, train)
        dec = FoldedDecoder3D(self.init_features, name="decoder",
                              **kw)(bottleneck, feats, train)
        yf = FoldedHConv3(self.n_cls, 1, (self.init_features,),
                          name="conv", **kw)(dec, train)
        return s2d3d.unfold3(yf, tuple(self.fold))


class UNet3DDTCS2D(nn.Module):
    """UNet3DDTC (unet3d_dtc.py:61-98) on the folded layout: dual tanh
    SDF + seg 1x1x1 heads over the folded pre-head features.  Identical
    parameter tree / checkpoints to 'unet3d_dtc'."""

    in_channels: int
    n_cls: int
    init_features: int = 64
    fold: Sequence[int] = FOLD
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(fold=self.fold, hebb=self.hebb,
                  init_type=self.init_type, dtype=self.dtype)
        feats, bottleneck = FoldedEncoder3D(self.init_features,
                                            name="encoder",
                                            **kw)(x, train)
        dec = FoldedDecoder3D(self.init_features, name="decoder",
                              **kw)(bottleneck, feats, train)
        f = tuple(self.fold)
        sdf = jnp.tanh(s2d3d.unfold3(
            FoldedHConv3(self.n_cls, 1, (self.init_features,),
                         name="out_sdf", **kw)(dec, train), f))
        seg = s2d3d.unfold3(
            FoldedHConv3(self.n_cls, 1, (self.init_features,),
                         name="out_seg", **kw)(dec, train), f)
        return sdf, seg


class UNet3DCCTS2D(nn.Module):
    """UNet3DCCT (unet3d_cct.py:125-174) on the folded layout: the
    shared decoder + head run folded for all four passes (clean + 3
    perturbed), so the fold pays 4x.  Perturbations are applied in the
    ORIGINAL layout (identical semantics and rng draws to 'unet3d_cct'
    — feats[0] is unfolded, perturbed, refolded).  Identical parameter
    tree / checkpoints.

    ``batched_aux=True`` (network 'unet3d_cct_s2d_batched') runs the
    clean + 3 perturbed decoder passes as ONE 4N-batched rematted
    apply instead of 4 serial ones (same trick as the 2D
    'unet_cct_s2d_batched').  Same parameter tree.  DOCUMENTED
    deviation from the reference protocol, train mode only: BatchNorm
    batch statistics are computed over the combined 4N batch instead
    of per-pass.  Eval mode has no perturbed passes, so eval outputs /
    checkpoints stay exactly interchangeable."""

    in_channels: int
    n_cls: int
    init_features: int = 64
    fold: Sequence[int] = FOLD
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None
    batched_aux: bool = False
    # None = full remat; "convs" = save conv outputs, recompute only
    # the elementwise tail in backward (models/common.remat_policy)
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .common import (cct_aux_outputs, perturb_features,
                             remat_policy)

        kw = dict(fold=self.fold, hebb=self.hebb,
                  init_type=self.init_type, dtype=self.dtype)
        f = tuple(self.fold)
        feats, bottleneck = FoldedEncoder3D(self.init_features,
                                            name="encoder",
                                            **kw)(x, train)
        # remat: see UNet3DCCT — 4 decoder passes/forward OOM the HBM
        # at the reference patch size without it
        decoder = nn.remat(FoldedDecoder3D, static_argnums=(3,),
                           policy=remat_policy(self.remat_policy))(
            self.init_features, name="main_decoder", **kw)
        head = FoldedHConv3(self.n_cls, 1, (self.init_features,),
                            name="conv", **kw)

        def decode(b, fs):
            return s2d3d.unfold3(head(decoder(b, fs, train), train), f)

        if not self.has_rng("perturb"):
            main = decode(bottleneck, feats)
            return main, main, main, main
        # perturbations run in the ORIGINAL layout (level 0 unfolded)
        # for rng-draw identity with the unfolded model, then map back
        # to decoder layout: [bottleneck, folded lvl0, lvls 1-3]
        all_feats = [s2d3d.unfold3(feats[0], f)] + feats[1:] \
            + [bottleneck]

        def perturb_one(k, kind):
            p = perturb_features(k, all_feats, kind)
            return [p[-1], s2d3d.fold3(p[0], f)] + p[1:4]

        return cct_aux_outputs(
            self.make_rng("perturb"), [bottleneck] + list(feats),
            perturb_one, lambda lv: decode(lv[0], lv[1:]),
            x.shape[0], self.batched_aux)
