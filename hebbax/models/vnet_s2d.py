"""Space-to-depth folded V-Net — TPU fast path for the vnet family.

Same math, parameter tree, and checkpoints as :class:`~hebbax.models.
vnet.VNet` (reference contract: models/networks_3d/vnet.py:44-195);
only the COMPUTE LAYOUT of the full-resolution level differs.  VNet's
top level runs 5^3 convs at C=16/32 over 96x96x80 — 8x/4x padding of
the 128-lane MXU; measured on the v5e (scripts/microbench_vnet.py,
bf16): in_tr conv 7.14 -> 0.35 ms, out_tr conv1 18.3 -> 1.13 ms,
up_tr32 LUConv 8.22 -> 2.28 ms, down_conv 0.60 -> 0.05 ms with a full
(2,2,2) fold (trimmed folded 5^3 kernel: 3^3 taps, 1.73x FLOPs —
ops/s2d3d.folded_k).

Folded here: in_tr, down_tr32's down_conv (consumes the folded level-0
tensor, emits unfolded half-res — s2d3d.fold_down_kernel3), up_tr32
(transpose emits the folded layout for free), out_tr.  Everything from
half resolution down is the plain VNet modules.  Exact f32 equivalence
is asserted in tests/test_vnet_s2d.py.  Select with
``--network vnet_s2d`` — checkpoints interchangeable with ``vnet``.
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..hebb.layers import (FoldedDownHConv3, FoldedHConv3,
                           FoldedHConvTranspose3)
from ..hebb.spec import HebbSpec
from ..ops import s2d3d
from .unet3d_s2d import FoldedBatchNorm3
from .vnet import DownTransition, OutputTransition, UpTransition

FOLD = (2, 2, 2)
PF = 8


class FoldedLUConvStack(nn.Module):
    """LUConvStack (vnet.py:44-61) on folded tensors; same param tree
    (conv{i}/bn{i})."""

    features: int
    n: int
    in_groups: Sequence[int]
    fold: Sequence[int] = FOLD
    # emit the LAST conv's output (and run its BN) in grouped-concat
    # order — lets the caller's residual add against a folded concat
    # skip the regroup3 activation permute
    out_groups: Optional[Sequence[int]] = None
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = tuple(self.fold)
        kw = dict(fold=f, hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        pf = s2d3d.prodf(f)
        groups = tuple(self.in_groups)
        for i in range(self.n):
            last = i == self.n - 1
            og = (tuple(self.out_groups)
                  if last and self.out_groups is not None else None)
            x = FoldedHConv3(self.features, 5, groups, out_groups=og,
                             name=f"conv{i + 1}", **kw)(x, train)
            x = FoldedBatchNorm3(pf, groups=og, dtype=self.dtype,
                                 name=f"bn{i + 1}")(x, train)
            x = nn.elu(x)
            groups = (self.features,)
        return x


class UpTransitionOpsFolded(nn.Module):
    """UpTransition (vnet.py:107-128) at a MID level whose residual
    LUConv stack runs space-to-depth folded: the transpose conv, BN,
    dropout, concat and residual add are the plain unfolded code, and
    only the 5^3 conv stack (the measured backward sink —
    scripts/microbench_bwd3d.py: 64->64 @48^3 fwd+dx+dw 9.3 -> 3.4 ms
    at fold (2,2,1)) is folded.  Same param tree as UpTransition."""

    out_features: int
    n_convs: int
    fold: Sequence[int] = (2, 2, 1)
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        from ..hebb.layers import HConvTranspose
        from .vnet import _bn

        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        skip = nn.Dropout(0.5, broadcast_dims=(1, 2, 3),
                          deterministic=not train)(skip)
        up = HConvTranspose(self.out_features // 2, kernel_size=(2, 2, 2),
                            strides=2, name="up_conv", **kw)(x, train)
        up = nn.elu(_bn(self, up, train, "bn1", self.dtype))
        xcat = jnp.concatenate([up, skip], axis=-1)
        f = tuple(self.fold)
        out = FoldedLUConvStack(self.out_features, self.n_convs,
                                (self.out_features,), fold=f, name="ops",
                                **kw)(s2d3d.fold3(xcat, f), train)
        return nn.elu(s2d3d.unfold3(out, f) + xcat)


class DownTransitionOpsFolded(nn.Module):
    """DownTransition (vnet.py:85-104) at a MID level with only the
    LUConv stack folded (see UpTransitionOpsFolded).  Same param tree."""

    out_features: int
    n_convs: int
    fold: Sequence[int] = (2, 2, 1)
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..hebb.layers import HConv
        from .vnet import _bn

        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        down = HConv(self.out_features, kernel_size=(2, 2, 2), strides=2,
                     name="down_conv", **kw)(x, train)
        down = nn.elu(_bn(self, down, train, "bn1", self.dtype))
        f = tuple(self.fold)
        out = FoldedLUConvStack(self.out_features, self.n_convs,
                                (self.out_features,), fold=f, name="ops",
                                **kw)(s2d3d.fold3(down, f), train)
        return nn.elu(s2d3d.unfold3(out, f) + down)


class FoldedInputTransition(nn.Module):
    """InputTransition (vnet.py:64-82) on the folded layout.  Takes the
    UNFOLDED input, returns the FOLDED 16-channel tensor."""

    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        xf = s2d3d.fold3(x, FOLD)
        out = FoldedHConv3(16, 5, (in_ch,), fold=FOLD, hebb=self.hebb,
                           init_type=self.init_type, dtype=self.dtype,
                           name="conv1")(xf, train)
        out = FoldedBatchNorm3(PF, dtype=self.dtype, name="bn1")(
            out, train)
        # input broadcast to 16 channels, in folded standard order:
        # tile each subpixel block's channels (vnet.py:76-80)
        x16 = jnp.tile(
            xf.reshape(xf.shape[:-1] + (PF, in_ch)),
            (1, 1, 1, 1, 1, 16 // in_ch)).reshape(
                xf.shape[:-1] + (PF * 16,))
        return nn.elu(out + x16)


class DownTransitionFromFolded(nn.Module):
    """DownTransition (vnet.py:85-104) whose down_conv CONSUMES the
    folded level-0 tensor (dense matmul); the rest of the block is the
    plain half-resolution VNet code.  Same param tree."""

    out_features: int
    n_convs: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xf, train: bool = False):
        from .vnet import _bn

        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        down = FoldedDownHConv3(self.out_features, fold=FOLD,
                                name="down_conv", **kw)(xf, train)
        down = nn.elu(_bn(self, down, train, "bn1", self.dtype))
        # the 5^3 C=32 LUConv stack at half-res still pads the MXU lane
        # axis 4x — refold for the stack (measured win,
        # scripts/microbench_vnet.py "LUConv 5^3 32->32 @half"); the
        # fold/unfold relayouts are ~7 MB of HBM traffic each
        downf = s2d3d.fold3(down, FOLD)
        out = FoldedLUConvStack(self.out_features, self.n_convs,
                                (self.out_features,), name="ops",
                                **kw)(downf, train)
        return s2d3d.unfold3(nn.elu(out + downf), FOLD)


class UpTransitionFolded(nn.Module):
    """UpTransition (vnet.py:107-128) at the full-resolution level: the
    k2/s2 transpose conv emits the FOLDED layout for free, the skip
    arrives FOLDED, and the LUConv stack runs folded.  Same param
    tree."""

    out_features: int
    n_convs: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, skip_f, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        half = self.out_features // 2
        # channel dropout (vnet.py:96-97, nn.Dropout broadcast_dims=
        # (1,2,3)): per (N, ORIGINAL channel), shared across the
        # subpixel blocks — apply on the (..., PF, C) view
        c = skip_f.shape[-1] // PF
        sk = skip_f.reshape(skip_f.shape[:-1] + (PF, c))
        sk = nn.Dropout(0.5, broadcast_dims=(1, 2, 3, 4),
                        deterministic=not train)(sk)
        skip_f = sk.reshape(skip_f.shape[:-1] + (PF * c,))
        up = FoldedHConvTranspose3(half, fold=FOLD, name="up_conv",
                                   **kw)(x, train)
        up = nn.elu(FoldedBatchNorm3(PF, dtype=self.dtype,
                                     name="bn1")(up, train))
        # keep the concat in GROUPED order and make the stack emit its
        # output in the same grouped order (free kernel-side permute,
        # s2d3d.group_out_perm) — the regroup3 activation permute this
        # replaces cost ~6 ms fwd+bwd on the v5e (r4 trace: 3.8 ms
        # backward 'split' alone).  The block's OUTPUT is therefore in
        # grouped (half, half) order; out_tr consumes it via in_groups.
        g = (half, skip_f.shape[-1] // PF)
        xcat = jnp.concatenate([up, skip_f], axis=-1)
        out = FoldedLUConvStack(self.out_features, self.n_convs,
                                g, out_groups=g, name="ops",
                                **kw)(xcat, train)
        return nn.elu(out + xcat)


class OutputTransitionFolded(nn.Module):
    """OutputTransition (vnet.py:131-146) on folded tensors; returns
    UNFOLDED logits."""

    n_cls: int
    # group structure of the folded input (up_tr32 now emits grouped
    # (half, half) order); None = standard single-group
    in_groups: Optional[Sequence[int]] = None
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xf, train: bool = False):
        kw = dict(fold=FOLD, hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        groups = (tuple(self.in_groups) if self.in_groups is not None
                  else (xf.shape[-1] // PF,))
        out = FoldedHConv3(self.n_cls, 5, groups,
                           name="conv1", **kw)(xf, train)
        out = nn.elu(FoldedBatchNorm3(PF, dtype=self.dtype,
                                      name="bn1")(out, train))
        out = FoldedHConv3(self.n_cls, 1, (self.n_cls,),
                           name="conv2", **kw)(out, train)
        return s2d3d.unfold3(out, FOLD)


class VNetS2D(nn.Module):
    """VNet with the full-resolution level space-to-depth folded (see
    module doc).  Identical parameter tree / checkpoints to ``vnet``."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        out16f = FoldedInputTransition(name="in_tr", **kw)(x, train)
        out32 = DownTransitionFromFolded(32, 1, name="down_tr32",
                                         **kw)(out16f, train)
        out64 = DownTransitionOpsFolded(64, 2, name="down_tr64",
                                        **kw)(out32, train)
        out128 = DownTransition(128, 3, name="down_tr128", **kw)(out64,
                                                                 train)
        out256 = DownTransition(256, 2, name="down_tr256", **kw)(out128,
                                                                 train)
        out = UpTransition(256, 2, name="up_tr256", **kw)(out256, out128,
                                                          train)
        out = UpTransition(128, 2, name="up_tr128", **kw)(out, out64,
                                                          train)
        out = UpTransitionOpsFolded(64, 1, name="up_tr64", **kw)(
            out, out32, train)
        out = UpTransitionFolded(32, 1, name="up_tr32", **kw)(out,
                                                              out16f,
                                                              train)
        return OutputTransitionFolded(self.n_cls, in_groups=(16, 16),
                                      name="out_tr", **kw)(out, train)


class VNetDecoderFolded(nn.Module):
    """VNetDecoder (vnet_cct.py:177-195) with the full-res level folded;
    takes out16 FOLDED, returns unfolded logits.  Param paths match
    main_decoder/up_tr*/out_tr exactly."""

    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, out256, out128, out64, out32, out16f,
                 train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        out = UpTransition(256, 2, name="up_tr256", **kw)(out256, out128,
                                                          train)
        out = UpTransition(128, 2, name="up_tr128", **kw)(out, out64,
                                                          train)
        out = UpTransitionOpsFolded(64, 1, name="up_tr64", **kw)(
            out, out32, train)
        out = UpTransitionFolded(32, 1, name="up_tr32", **kw)(out,
                                                              out16f,
                                                              train)
        return OutputTransitionFolded(self.n_cls, in_groups=(16, 16),
                                      name="out_tr", **kw)(out, train)


class VNetCCTS2D(nn.Module):
    """VNetCCT (vnet_cct.py:195-232) with the full-res level folded.
    Perturbations are applied in the ORIGINAL layout (identical
    semantics and rng draws to ``vnet_cct`` — out16 is unfolded,
    perturbed, refolded).  Same param tree / checkpoints.

    ``batched_aux=True`` (network 'vnet_cct_s2d_batched') runs the
    clean + 3 perturbed decoder passes as ONE 4N-batched rematted
    apply (same trick as 'unet_cct_s2d_batched').  Same parameter
    tree.  DOCUMENTED train-mode deviation: BatchNorm batch stats are
    computed over the combined 4N batch instead of per-pass; decoder
    dropout masks are drawn once for the 4N batch (still i.i.d. per
    sample).  Eval mode has no perturbed passes — eval outputs /
    checkpoints stay exactly interchangeable."""

    in_channels: int
    n_cls: int
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
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        out16f = FoldedInputTransition(name="in_tr", **kw)(x, train)
        out32 = DownTransitionFromFolded(32, 1, name="down_tr32",
                                         **kw)(out16f, train)
        out64 = DownTransitionOpsFolded(64, 2, name="down_tr64",
                                        **kw)(out32, train)
        out128 = DownTransition(128, 3, name="down_tr128", **kw)(out64,
                                                                 train)
        out256 = DownTransition(256, 2, name="down_tr256", **kw)(out128,
                                                                 train)
        decoder = nn.remat(VNetDecoderFolded, static_argnums=(6,),
                           policy=remat_policy(self.remat_policy))(
            self.n_cls, name="main_decoder", **kw)

        def decode(f256, f128, f64, f32, f16f):
            return decoder(f256, f128, f64, f32, f16f, train)

        if not self.has_rng("perturb"):
            main = decode(out256, out128, out64, out32, out16f)
            return main, main, main, main
        # perturbations run in the ORIGINAL layout (full-res level
        # unfolded) for rng-draw identity, then refold for the decoder
        feats = [out256, out128, out64, out32,
                 s2d3d.unfold3(out16f, FOLD)]

        def perturb_one(k, kind):
            p = perturb_features(k, feats, kind)
            return p[:4] + [s2d3d.fold3(p[4], FOLD)]

        return cct_aux_outputs(
            self.make_rng("perturb"),
            [out256, out128, out64, out32, out16f],
            perturb_one, lambda lv: decode(*lv),
            x.shape[0], self.batched_aux)


class VNetDTCS2D(nn.Module):
    """VNetDTC (vnet_dtc.py:148-190) with the full-res level folded;
    dual SDF(tanh)/seg OutputTransition heads.  Same param tree."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        out16f = FoldedInputTransition(name="in_tr", **kw)(x, train)
        out32 = DownTransitionFromFolded(32, 1, name="down_tr32",
                                         **kw)(out16f, train)
        out64 = DownTransitionOpsFolded(64, 2, name="down_tr64",
                                        **kw)(out32, train)
        out128 = DownTransition(128, 3, name="down_tr128", **kw)(out64,
                                                                 train)
        out256 = DownTransition(256, 2, name="down_tr256", **kw)(out128,
                                                                 train)
        out = UpTransition(256, 2, name="up_tr256", **kw)(out256, out128,
                                                          train)
        out = UpTransition(128, 2, name="up_tr128", **kw)(out, out64,
                                                          train)
        out = UpTransitionOpsFolded(64, 1, name="up_tr64", **kw)(
            out, out32, train)
        out = UpTransitionFolded(32, 1, name="up_tr32", **kw)(out,
                                                              out16f,
                                                              train)
        sdf = jnp.tanh(OutputTransitionFolded(self.n_cls,
                                              in_groups=(16, 16),
                                              name="out_sdf",
                                              **kw)(out, train))
        seg = OutputTransitionFolded(self.n_cls, in_groups=(16, 16),
                                     name="out_seg",
                                     **kw)(out, train)
        return sdf, seg
