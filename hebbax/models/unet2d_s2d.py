"""Space-to-depth folded UNet2D — the TPU-fast flagship variant.

Same math, same parameter tree, same checkpoints as
:class:`~hebbax.models.unet2d.UNet2D` (reference contract:
models/networks_2d/unet.py:423-478); only the COMPUTE LAYOUT differs.
The top pyramid levels (C = 16/32 at 128²/64²) and the 3-conv MLP head
run space-to-depth folded (ops/s2d.py): 2x2 spatial blocks fold into
channels so the 3x3 convs present 64..256-channel contractions to the
128-lane MXU instead of 16..64-channel ones (measured ~50x off peak at
C=16 — CLAUDE.md).  Levels 2-4 (C >= 64 at <= 32²) stay unfolded.

Exact f32 equivalence with UNet2D (eval outputs, Hebbian deltas,
BN batch stats) is asserted in tests/test_s2d.py.  Select with
``--network unet_s2d`` — checkpoints are interchangeable with ``unet``
in both directions.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropout import FastDropout
from ..hebb.layers import FoldedHConv, HConv
from ..hebb.spec import HebbSpec
from ..ops import s2d
from .common import (cct_aux_outputs, max_pool, perturb_features,
                     resize_linear_align_corners, resize_nearest_torch)
from .unet2d import BN_GAIN, ENC_DROPOUT, FEATURES, ConvBlockLeaky


class FoldedBatchNorm(nn.Module):
    """flax.linen.BatchNorm semantics computed on a FOLDED tensor.

    Stats are taken per ORIGINAL channel — i.e. over (N, P, Q) and the
    4 subpixel blocks — so params/stats are (C,) exactly like the
    unfolded model's BatchNorm (same names: scale/bias, mean/var)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    gain_init: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1] // 4
        scale_init = (nn.initializers.ones if self.gain_init is None else
                      (lambda key, shape, dtype=jnp.float32:
                       1.0 + self.gain_init
                       * jax.random.normal(key, shape, dtype)))
        scale = self.param("scale", scale_init, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (c,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (c,))

        xg = x.reshape(x.shape[:-1] + (4, c))
        if train:
            # stats in f32 regardless of compute dtype (flax BatchNorm
            # semantics — bf16 accumulation over N*H*W loses precision)
            xs = xg.astype(jnp.float32)
            mean = jnp.mean(xs, axis=(0, 1, 2, 3))
            mean2 = jnp.mean(jax.lax.square(xs), axis=(0, 1, 2, 3))
            var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        dtype = self.dtype or x.dtype
        y = (xg - mean.astype(dtype)) * jax.lax.rsqrt(
            var.astype(dtype) + jnp.asarray(self.epsilon, dtype))
        y = y * scale.astype(dtype) + bias.astype(dtype)
        return y.reshape(x.shape)


class FoldedConvBlockLeaky(nn.Module):
    """ConvBlockLeaky (unet.py:48-64) on folded tensors; same param
    tree (conv1/bn1/conv2/bn2 + Dropout)."""

    features: int
    dropout_p: float
    in_groups: tuple
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        x = FoldedHConv(self.features, 3, self.in_groups, name="conv1",
                        **kw)(x, train)
        x = FoldedBatchNorm(gain_init=BN_GAIN, dtype=self.dtype,
                            name="bn1")(x, train)
        x = nn.leaky_relu(x)
        x = FastDropout(self.dropout_p, deterministic=not train)(x)
        x = FoldedHConv(self.features, 3, (self.features,), name="conv2",
                        **kw)(x, train)
        x = FoldedBatchNorm(gain_init=BN_GAIN, dtype=self.dtype,
                            name="bn2")(x, train)
        return nn.leaky_relu(x)


class FoldedConvBlockReLU(nn.Module):
    """Decoder ConvBlock (unet.py:31-45) on folded tensors."""

    features: int
    in_groups: tuple
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        x = FoldedHConv(self.features, 3, self.in_groups, name="conv1",
                        **kw)(x, train)
        x = FoldedBatchNorm(gain_init=BN_GAIN, dtype=self.dtype,
                            name="bn1")(x, train)
        x = nn.relu(x)
        x = FoldedHConv(self.features, 3, (self.features,), name="conv2",
                        **kw)(x, train)
        x = FoldedBatchNorm(gain_init=BN_GAIN, dtype=self.dtype,
                            name="bn2")(x, train)
        return nn.relu(x)


class FoldedMLPHead(nn.Module):
    """MLPHead (unet.py:449-455) on folded tensors; returns UNFOLDED
    logits.

    ``depth=2`` re-folds the (once-folded) input so the three head
    convs run 4x4-folded — 16x the dense FLOPs but full 128-lane
    contractions (the head's 16/64/32/2-channel convs at full
    resolution are the worst MXU shapes left in the 2D model)."""

    n_cls: int
    kernel: int = 3
    multiple_layers: bool = True
    depth: int = 1
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = x.shape[-1] // 4
        for _ in range(self.depth - 1):
            x = s2d.fold(x)
        kw = dict(kernel_size=self.kernel, depth=self.depth,
                  hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)

        def out(y):
            for _ in range(self.depth):
                y = s2d.unfold(y)
            return y

        if not self.multiple_layers:
            return out(FoldedHConv(self.n_cls, in_groups=(ch,),
                                   name="conv_out", **kw)(x, train))
        x = FoldedHConv(ch * 4, in_groups=(ch,), name="conv1",
                        **kw)(x, train)
        x = FastDropout(0.5, deterministic=not train)(nn.relu(x))
        x = FoldedHConv(ch * 2, in_groups=(ch * 4,), name="conv2",
                        **kw)(x, train)
        x = FastDropout(0.5, deterministic=not train)(nn.relu(x))
        return out(FoldedHConv(self.n_cls, in_groups=(ch * 2,),
                               name="conv_out", **kw)(x, train))


class FoldedEncoder2D(nn.Module):
    """Encoder2D with levels 0-1 folded.  feats[0]/feats[1] are returned
    FOLDED (their consumers — the folded decoder blocks — concat them in
    folded layout); feats[2..4] unfolded, byte-identical to Encoder2D."""

    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        in_ch = x.shape[-1]
        feats = []
        xf = s2d.fold(x)
        xf = FoldedConvBlockLeaky(FEATURES[0], ENC_DROPOUT[0], (in_ch,),
                                  name="in_conv", **kw)(xf, train)
        feats.append(xf)                                # folded 16@H
        x1 = s2d.fold(s2d.subpixel_max(xf))             # pool -> fold
        x1 = FoldedConvBlockLeaky(FEATURES[1], ENC_DROPOUT[1],
                                  (FEATURES[0],), name="down1",
                                  **kw)(x1, train)
        feats.append(x1)                                # folded 32@H/2
        xk = s2d.subpixel_max(x1)                       # unfolded 32@H/4
        for i in range(2, 5):
            if i > 2:
                xk = max_pool(xk)
            xk = ConvBlockLeaky(FEATURES[i], ENC_DROPOUT[i],
                                name=f"down{i}", **kw)(xk, train)
            feats.append(xk)
        return feats


class FoldedUpBlock(nn.Module):
    """UpBlock2D whose ConvBlock runs folded.  ``x1`` arrives unfolded
    (or is unfolded here), the 1x1 conv + align-corners resize run
    unfolded exactly as in UpBlock2D, and the concat + ConvBlock run
    folded.  skip (x2) must be passed FOLDED."""

    mid: int
    out: int
    skip_ch: int
    x_folded: bool
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2_folded, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        if self.x_folded:
            x1 = s2d.unfold(x1)
        x1 = HConv(self.mid, kernel_size=1, name="conv1x1",
                   **kw)(x1, train)
        out_spatial = (x2_folded.shape[1] * 2, x2_folded.shape[2] * 2)
        x1 = resize_linear_align_corners(x1, out_spatial)
        x = jnp.concatenate([x2_folded, s2d.fold(x1)], axis=-1)
        return FoldedConvBlockReLU(self.out, (self.skip_ch, self.mid),
                                   name="conv", **kw)(x, train)


class FoldedDecoder2D(nn.Module):
    """Decoder2D with up3/up4 folded; param paths match main_decoder/
    up{1..4} exactly."""

    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from .unet2d import UpBlock2D

        x0f, x1f, x2, x3, x4 = feats
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        h = UpBlock2D(FEATURES[3], FEATURES[3], name="up1",
                      **kw)(x4, x3, train)
        h = UpBlock2D(FEATURES[2], FEATURES[2], name="up2",
                      **kw)(h, x2, train)
        h = FoldedUpBlock(FEATURES[1], FEATURES[1], FEATURES[1],
                          x_folded=False, name="up3", **kw)(h, x1f, train)
        h = FoldedUpBlock(FEATURES[0], FEATURES[0], FEATURES[0],
                          x_folded=True, name="up4", **kw)(h, x0f, train)
        return h


class UNetURPC2DS2D(nn.Module):
    """UNetURPC2D (unet_urpc.py:201-264) with the top decoder levels
    folded.  Identical parameter tree / checkpoints to ``unet_urpc``;
    the dp1 and main heads run folded (their inputs are the folded up3/
    up4 outputs) and emit unfolded logits.  Select with
    ``--network unet_urpc_s2d`` in the URPC trainers."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .unet2d import UpBlock2D

        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        ckw = dict(kernel_size=3, padding=1, **kw)
        shape = x.shape[1:-1]
        x0f, x1f, x2, x3, x4 = FoldedEncoder2D(name="encoder",
                                               **kw)(x, train)
        up = UpBlock2D(FEATURES[3], FEATURES[3], name="up1", **kw)(
            x4, x3, train)
        dp3 = HConv(self.n_cls, name="out_conv_dp3", **ckw)(up, train)
        dp3 = resize_nearest_torch(dp3, shape)
        up = UpBlock2D(FEATURES[2], FEATURES[2], name="up2", **kw)(
            up, x2, train)
        dp2 = HConv(self.n_cls, name="out_conv_dp2", **ckw)(up, train)
        dp2 = resize_nearest_torch(dp2, shape)
        up = FoldedUpBlock(FEATURES[1], FEATURES[1], FEATURES[1],
                           x_folded=False, name="up3", **kw)(up, x1f,
                                                             train)
        dp1 = s2d.unfold(FoldedHConv(self.n_cls, 3, (FEATURES[1],),
                                     name="out_conv_dp1", **kw)(up,
                                                                train))
        dp1 = resize_nearest_torch(dp1, shape)
        up = FoldedUpBlock(FEATURES[0], FEATURES[0], FEATURES[0],
                           x_folded=True, name="up4", **kw)(up, x0f,
                                                            train)
        dp0 = s2d.unfold(FoldedHConv(self.n_cls, 3, (FEATURES[0],),
                                     name="out_conv", **kw)(up, train))
        return dp0, dp1, dp2, dp3


def _perturb_folded(key, feats, kind: str):
    """CCT perturbation with ORIGINAL-layout semantics AND rng draws
    identical to the unfolded model: unfold the two folded levels,
    perturb the 5-feature list exactly as UNetCCT2D does, refold."""
    unfolded = [s2d.unfold(feats[0]), s2d.unfold(feats[1])] + \
        list(feats[2:])
    p = perturb_features(key, unfolded, kind)
    return [s2d.fold(p[0]), s2d.fold(p[1])] + p[2:]


class UNetCCT2DS2D(nn.Module):
    """UNetCCT2D (unet_cct.py:184-267) with the shared decoder's top
    levels folded — the decoder runs 4x (clean + 3 perturbations), so
    folding its small-channel half pays 4x.  Same parameter tree /
    checkpoints as ``unet_cct``; perturbations are applied in the
    original layout (identical rng draws — see _perturb_folded).

    ``batched_aux=True`` (network 'unet_cct_s2d_batched') runs the
    clean + 3 perturbed decoder passes as ONE 4N-batched apply instead
    of 4 serial ones.  Same parameter tree.  DOCUMENTED deviation from
    the reference protocol, train mode only: BatchNorm batch statistics
    are computed over the combined 4N batch (the serial protocol
    normalizes each pass with its own N-sample stats and folds running
    stats in sequentially), and decoder dropout masks are drawn once
    for the 4N batch (still i.i.d. per sample).  Eval mode has no
    perturbed passes, so eval outputs/checkpoints stay exactly
    interchangeable."""

    in_channels: int
    n_cls: int
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None
    batched_aux: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .unet2d import UpBlock2D

        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        feats = FoldedEncoder2D(name="encoder", **kw)(x, train)
        ups = [UpBlock2D(FEATURES[3], FEATURES[3], name="up1", **kw),
               UpBlock2D(FEATURES[2], FEATURES[2], name="up2", **kw),
               FoldedUpBlock(FEATURES[1], FEATURES[1], FEATURES[1],
                             x_folded=False, name="up3", **kw),
               FoldedUpBlock(FEATURES[0], FEATURES[0], FEATURES[0],
                             x_folded=True, name="up4", **kw)]
        head = FoldedHConv(self.n_cls, 3, (FEATURES[0],),
                           name="out_conv", **kw)

        def decode(f):
            x0f, x1f, x2, x3, x4 = f
            d = ups[0](x4, x3, train)
            d = ups[1](d, x2, train)
            d = ups[2](d, x1f, train)
            d = ups[3](d, x0f, train)
            return s2d.unfold(head(d, train))

        if not self.has_rng("perturb"):
            main = decode(feats)
            return main, main, main, main
        return cct_aux_outputs(
            self.make_rng("perturb"), list(feats),
            lambda k, kind: _perturb_folded(k, feats, kind),
            decode, x.shape[0], self.batched_aux)


class UNet2DS2D(nn.Module):
    """UNet2D with space-to-depth folded top levels (see module doc).

    ``head_depth=2`` runs the 3-conv MLP head 4x4-folded (see
    FoldedMLPHead); requires H, W % 8 == 0."""

    in_channels: int
    n_cls: int
    linear_probe: bool = False
    multiple_layers: bool = True
    head_depth: int = 1
    hebb: Optional[HebbSpec] = None
    init_type: str = "kaiming"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(hebb=self.hebb, init_type=self.init_type,
                  dtype=self.dtype)
        feats = FoldedEncoder2D(name="encoder", **kw)(x, train)
        dec = FoldedDecoder2D(name="main_decoder", **kw)(feats, train)
        return FoldedMLPHead(self.n_cls, 1 if self.linear_probe else 3,
                             self.multiple_layers, depth=self.head_depth,
                             name="out_conv", **kw)(dec, train)
