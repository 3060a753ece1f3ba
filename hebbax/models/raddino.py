"""Frozen ViT encoder + trainable transpose-conv decoder
(reference: /root/reference/train_semi_raddino_decoder_2d.py:178-207).

The reference loads HF ``microsoft/rad-dino`` (a DINOv2 ViT-B/14) with
``AutoModel`` and trains only an inline ConvTranspose2d decoder on the
patch-token grid.  Here:

* :class:`ViTEncoder` — a flax ViT-B/14 (768 dim, 12 layers, CLS token,
  GELU MLP, pre-LN) producing ``last_hidden_state``-style tokens.
* :func:`load_hf_rad_dino_params` converts cached HF torch weights into
  the flax tree when transformers + the checkpoint are available; in
  offline environments the encoder runs with its random init (documented
  — the decoder training protocol is unchanged).
* :class:`RadDinoDecoder` — the exact decoder stack
  (train_semi_raddino_decoder_2d.py:194-207).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import resize_nearest_torch


class ViTBlock(nn.Module):
    dim: int = 768
    heads: int = 12
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(y)
        y = nn.Dense(self.dim, name="fc2")(nn.gelu(y))
        return x + y


class ViTEncoder(nn.Module):
    """ViT-B/14, 224^2 -> (B, 1 + 16*16, 768) tokens."""

    dim: int = 768
    depth: int = 12
    patch: int = 14

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    name="patch_embed")(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h * w + 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1) + pos
        for i in range(self.depth):
            x = ViTBlock(self.dim, name=f"block{i}")(x)
        return nn.LayerNorm(name="norm")(x)


def reshape_patch_embeddings(tokens, image_size=224, patch_size=14):
    """Drop CLS, tokens -> (B, g, g, C) grid
    (train_semi_raddino_decoder_2d.py:183-191, channels-last here)."""
    g = image_size // patch_size
    t = tokens[:, 1:]
    return t.reshape(t.shape[0], g, g, t.shape[-1])


class RadDinoDecoder(nn.Module):
    """ConvT(768->256,k3,s1) BN ReLU -> ConvT(256->128,k3,s2) ->
    ConvT(128->64,k7,s3) -> Upsample(222, nearest) -> ConvT(64->C,k3,s1)
    (train_semi_raddino_decoder_2d.py:194-207).

    ``out_size`` is the final map side; the reference protocol is 224
    (the nearest-resize target is out_size-2 so the VALID k3 out conv
    lands exactly on out_size).  Non-default values are for scaled-down
    tests only."""

    n_cls: int
    out_size: int = 224

    @nn.compact
    def __call__(self, x, train: bool = False):
        def convt(ch, k, s, name):
            return nn.ConvTranspose(ch, (k, k), strides=(s, s),
                                    padding="VALID", name=name)

        x = convt(256, 3, 1, "deconv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(nn.relu(x))
        x = convt(128, 3, 2, "deconv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(nn.relu(x))
        x = convt(64, 7, 3, "deconv3")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn3")(nn.relu(x))
        x = resize_nearest_torch(x, (self.out_size - 2, self.out_size - 2))
        return convt(max(self.n_cls, 2), 3, 1, "out")(x)


def load_hf_rad_dino_params(flax_params, repo="microsoft/rad-dino"):
    """Copy cached HF rad-dino weights into the flax ViT tree.  Returns
    the updated tree, or the input unchanged when transformers/weights
    are unavailable (offline)."""
    try:
        import torch  # noqa: F401
        from transformers import AutoModel

        hf = AutoModel.from_pretrained(repo)
    except Exception:
        return flax_params, False

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    try:
        return apply_hf_state_dict(flax_params, sd), True
    except AssertionError as e:
        # e.g. a scaled-down test encoder (dim != 768) on a machine that
        # DOES have the real checkpoint cached: fall back like offline
        print(f"# rad-dino checkpoint incompatible with this encoder "
              f"config ({e}); keeping random init")
        return flax_params, False


def apply_hf_state_dict(flax_params, sd):
    """Map an HF dinov2 ViT-B state dict (name -> numpy array, torch
    layouts) onto the flax ViTEncoder tree.  Pure function so the key
    mapping is testable offline against a synthetic state dict."""
    p = jax.tree_util.tree_map(np.asarray, flax_params)

    def put(dst_path, value):
        node = p
        for k in dst_path[:-1]:
            node = node[k]
        assert node[dst_path[-1]].shape == value.shape, dst_path
        node[dst_path[-1]] = value

    emb = "embeddings."
    put(("patch_embed", "kernel"),
        sd[emb + "patch_embeddings.projection.weight"].transpose(2, 3, 1, 0))
    put(("patch_embed", "bias"), sd[emb + "patch_embeddings.projection.bias"])
    put(("cls_token",), sd[emb + "cls_token"])
    put(("pos_embed",), sd[emb + "position_embeddings"])
    # transformer blocks: HF dinov2 naming; depth follows the flax tree
    # (12 for the real ViT-B checkpoint, fewer in scaled-down tests)
    n_blocks = sum(1 for k in p if str(k).startswith("block"))
    for i in range(n_blocks):
        b = f"encoder.layer.{i}."
        blk = (f"block{i}",)
        put(blk + ("norm1", "scale"), sd[b + "norm1.weight"])
        put(blk + ("norm1", "bias"), sd[b + "norm1.bias"])
        put(blk + ("norm2", "scale"), sd[b + "norm2.weight"])
        put(blk + ("norm2", "bias"), sd[b + "norm2.bias"])
        for name, hf_name in (("query", "attention.attention.query"),
                              ("key", "attention.attention.key"),
                              ("value", "attention.attention.value")):
            w = sd[b + hf_name + ".weight"]
            bias = sd[b + hf_name + ".bias"]
            put(blk + ("attn", name, "kernel"),
                w.T.reshape(768, 12, 64))
            put(blk + ("attn", name, "bias"), bias.reshape(12, 64))
        w = sd[b + "attention.output.dense.weight"]
        put(blk + ("attn", "out", "kernel"), w.T.reshape(12, 64, 768))
        put(blk + ("attn", "out", "bias"),
            sd[b + "attention.output.dense.bias"])
        put(blk + ("fc1", "kernel"), sd[b + "mlp.fc1.weight"].T)
        put(blk + ("fc1", "bias"), sd[b + "mlp.fc1.bias"])
        put(blk + ("fc2", "kernel"), sd[b + "mlp.fc2.weight"].T)
        put(blk + ("fc2", "bias"), sd[b + "mlp.fc2.bias"])
    put(("norm", "scale"), sd["layernorm.weight"])
    put(("norm", "bias"), sd["layernorm.bias"])
    return p
