"""On-device 2D train augmentation (jit-safe, per-sample vmap).

TPU-native alternative to the host-side numpy pipeline
(hebbax/data/augment2d.py): the host supplies cached decoded+resized+
normalized tensors and the SAME augmentation distribution as the
reference's albumentations chain (Flip p=.75 with d~U{-1,0,1}, Transpose
p=.5, Rot90 k~U{0..3}; online_aug.py:7-12) is applied inside the jitted
train step from a PRNG key — host CPU stops being the bottleneck.

Requires square spatial dims (the reference resizes to 128x128 first).
Image and mask receive identical transforms.
"""

import jax
import jax.numpy as jnp
from jax import lax


def _apply_one(img, mask, flip_on, flip_d, transpose_on, rot_k):
    """img (H,W,C), mask (H,W) int; all decision scalars traced."""

    def flip(x):
        # d: 0 vertical, 1 horizontal, 2 both (albumentations cv2.flip
        # semantics with d=-1 mapped to index 2)
        return lax.switch(flip_d, [
            lambda v: v[::-1],
            lambda v: v[:, ::-1],
            lambda v: v[::-1, ::-1],
        ], x)

    def maybe(cond, fn, x):
        return lax.cond(cond, fn, lambda v: v, x)

    def rot(x):
        return lax.switch(rot_k, [
            lambda v: v,
            lambda v: jnp.rot90(v, 1),
            lambda v: jnp.rot90(v, 2),
            lambda v: jnp.rot90(v, 3),
        ], x)

    def transform(x):
        x = maybe(flip_on, flip, x)
        x = maybe(transpose_on, lambda v: jnp.swapaxes(v, 0, 1), x)
        return rot(x)

    return transform(img), transform(mask[..., None])[..., 0]


def augment_batch(key, images, masks):
    """images (N,H,W,C) float, masks (N,H,W) int; H == W required."""
    n = images.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    flip_on = jax.random.uniform(k1, (n,)) < 0.75
    flip_d = jax.random.randint(k2, (n,), 0, 3)
    transpose_on = jax.random.uniform(k3, (n,)) < 0.5
    rot_k = jax.random.randint(k4, (n,), 0, 4)
    return jax.vmap(_apply_one)(images, masks, flip_on, flip_d,
                                transpose_on, rot_k)
