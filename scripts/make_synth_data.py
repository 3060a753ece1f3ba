#!/usr/bin/env python
"""Generate a tiny synthetic dataset in the reference layout for smoke
runs: 2D (<out>/{train,val}/{image,mask} PNGs) and/or 3D
(<out3d>/{train,val}/{image,mask,mask_sdf1} NRRDs)."""

import argparse
import os

import numpy as np
from PIL import Image


def make_2d(out, n_train, n_val, size, seed=0):
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        os.makedirs(os.path.join(out, split, "image"), exist_ok=True)
        os.makedirs(os.path.join(out, split, "mask"), exist_ok=True)
        for i in range(n):
            yy, xx = np.mgrid[:size, :size]
            cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
            r = rng.integers(size // 8, size // 4)
            mask = ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r).astype(
                np.uint8)
            img = np.stack([mask * 150 + 50, mask * 100 + 70,
                            np.full_like(mask, 90)], -1).astype(np.uint8)
            img = np.clip(img + rng.integers(0, 30, img.shape), 0,
                          255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(out, split, "image", f"{i}.png"))
            Image.fromarray(mask * 255).save(
                os.path.join(out, split, "mask", f"{i}.png"))
    print("2D dataset at", out)


def make_2d_texture(out, n_train, n_val, size, seed=0, period=5.0,
                    noise=0.5):
    """Texture-discrimination dataset with NO intensity cue: foreground
    blobs carry a grating orthogonal to the background grating, with
    identical mean/contrast on both sides.  From-random fine-tuning at
    1-5% labels does not saturate here, while unsupervised Hebbian
    pretraining can learn the oriented filters that separate the
    regions — the headroom the bootstrap-advantage benchmark needs
    (VERDICT r3 next-round #2)."""
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        os.makedirs(os.path.join(out, split, "image"), exist_ok=True)
        os.makedirs(os.path.join(out, split, "mask"), exist_ok=True)
        for i in range(n):
            yy, xx = np.mgrid[:size, :size].astype(np.float64)
            # 1-3 random ellipses define the foreground
            mask = np.zeros((size, size), bool)
            for _ in range(int(rng.integers(1, 4))):
                cy, cx = rng.uniform(size * 0.2, size * 0.8, 2)
                ry, rx = rng.uniform(size * 0.12, size * 0.3, 2)
                th = rng.uniform(0, np.pi)
                dy, dx = yy - cy, xx - cx
                u = dy * np.cos(th) + dx * np.sin(th)
                v = -dy * np.sin(th) + dx * np.cos(th)
                mask |= (u / ry) ** 2 + (v / rx) ** 2 < 1.0
            theta = rng.uniform(0, np.pi)
            phase_bg, phase_fg = rng.uniform(0, 2 * np.pi, 2)
            f = 2 * np.pi / (period * rng.uniform(0.9, 1.1))

            def grating(angle, phase):
                return np.sin(f * (xx * np.cos(angle)
                                   + yy * np.sin(angle)) + phase)

            tex = np.where(mask, grating(theta + np.pi / 2, phase_fg),
                           grating(theta, phase_bg))
            img = 128.0 + 55.0 * tex + rng.normal(
                0, noise * 55.0, tex.shape)
            img = np.clip(img, 0, 255).astype(np.uint8)
            img = np.stack([img] * 3, -1)
            Image.fromarray(img).save(
                os.path.join(out, split, "image", f"{i}.png"))
            Image.fromarray(mask.astype(np.uint8) * 255).save(
                os.path.join(out, split, "mask", f"{i}.png"))
    print("2D texture dataset at", out)


def make_2d_palette(out, n_train, n_val, size, seed=0, noise=0.15,
                    sat=0.5):
    """Color-prototype generalization dataset: foreground ellipses whose
    HUE differs from the background hue, with both hues drawn fresh per
    image at FIXED luminance and saturation (no intensity shortcut).
    A handful of labeled images covers only a handful of hue pairs, so
    from-random fine-tuning at 1-5% labels cannot learn the general
    'region whose color differs' rule — but unsupervised Hebbian
    clustering over all images learns hue-prototype detectors (the cue
    SWTA is actually built for, unlike texture orientation), giving the
    bootstrap-advantage benchmark real headroom (VERDICT r3 #2)."""
    import colorsys

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        os.makedirs(os.path.join(out, split, "image"), exist_ok=True)
        os.makedirs(os.path.join(out, split, "mask"), exist_ok=True)
        for i in range(n):
            yy, xx = np.mgrid[:size, :size].astype(np.float64)
            mask = np.zeros((size, size), bool)
            for _ in range(int(rng.integers(1, 4))):
                cy, cx = rng.uniform(size * 0.2, size * 0.8, 2)
                ry, rx = rng.uniform(size * 0.12, size * 0.28, 2)
                th = rng.uniform(0, np.pi)
                dy, dx = yy - cy, xx - cx
                u = dy * np.cos(th) + dx * np.sin(th)
                v = -dy * np.sin(th) + dx * np.cos(th)
                mask |= (u / ry) ** 2 + (v / rx) ** 2 < 1.0
            h_bg = rng.uniform(0, 1)
            # fg hue at least 0.15 away on the hue circle
            h_fg = (h_bg + rng.uniform(0.15, 0.85)) % 1.0
            rgb_bg = colorsys.hsv_to_rgb(h_bg, sat, 0.6)
            rgb_fg = colorsys.hsv_to_rgb(h_fg, sat, 0.6)
            img = np.where(mask[..., None], np.asarray(rgb_fg),
                           np.asarray(rgb_bg)) * 255.0
            img = img + rng.normal(0, noise * 255.0, img.shape)
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                os.path.join(out, split, "image", f"{i}.png"))
            Image.fromarray(mask.astype(np.uint8) * 255).save(
                os.path.join(out, split, "mask", f"{i}.png"))
    print("2D palette dataset at", out)


def make_3d(out, n_train, n_val, shape, seed=0):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from hebbax.data.nrrd_io import write_nrrd
    from hebbax.ops.distance import mask_to_sdf

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        for sub in ("image", "mask", "mask_sdf1"):
            os.makedirs(os.path.join(out, split, sub), exist_ok=True)
        for i in range(n):
            vol = rng.normal(100, 20, shape).astype(np.float32)
            xx, yy, zz = np.mgrid[: shape[0], : shape[1], : shape[2]]
            c = [s // 2 for s in shape]
            r = min(shape) // 4
            mask = (((xx - c[0]) ** 2 + (yy - c[1]) ** 2
                     + (zz - c[2]) ** 2) < r * r).astype(np.uint8) * 255
            vol[mask > 0] += 60
            name = f"v{i}.nrrd"
            write_nrrd(os.path.join(out, split, "image", name), vol)
            write_nrrd(os.path.join(out, split, "mask", name), mask)
            write_nrrd(os.path.join(out, split, "mask_sdf1", name),
                       mask_to_sdf(mask > 0).astype(np.float32))
    print("3D dataset at", out)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/synthds")
    p.add_argument("--n", default=8, type=int)
    p.add_argument("--n_val", default=4, type=int)
    p.add_argument("--size", default=128, type=int)
    p.add_argument("--out3d", default=None)
    p.add_argument("--shape3d", default="64,64,32")
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args(argv)
    if args.out:
        make_2d(args.out, args.n, args.n_val, args.size, args.seed)
    if args.out3d:
        shape = tuple(int(x) for x in args.shape3d.split(","))
        make_3d(args.out3d, args.n, args.n_val, shape, args.seed)


if __name__ == "__main__":
    main()
