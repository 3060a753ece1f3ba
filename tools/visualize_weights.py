#!/usr/bin/env python
"""Visualize learned first-layer (Hebbian) filters as a PNG grid
(replaces the reference's visualize_weights.ipynb)."""

import argparse
import os

import numpy as np
from PIL import Image

from hebbax.utils.checkpoint import load_snapshot


def _first_conv_kernel(params, path=None):
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params)
    if path:
        want = tuple(path.split("."))
        for p, v in flat.items():
            if p[: len(want)] == want and p[-1] == "kernel":
                return p, v
        raise KeyError(path)
    # first kernel with spatial extent, by insertion order
    for p, v in flat.items():
        if p[-1] == "kernel" and v.ndim == 4 and v.shape[0] > 1:
            return p, v
    raise KeyError("no 2D conv kernel found")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--snapshot", required=True)
    parser.add_argument("--layer", default=None,
                        help="dotted module path (default: first conv)")
    parser.add_argument("--out", default="filters.png")
    parser.add_argument("--scale", default=16, type=int)
    args = parser.parse_args(argv)

    variables, meta = load_snapshot(args.snapshot)
    path, kernel = _first_conv_kernel(variables["params"], args.layer)
    k = np.asarray(kernel)              # (kh, kw, I, O)
    kh, kw, ci, co = k.shape
    print(f"layer {'.'.join(path)}: kernel {k.shape}")
    # normalize each filter to [0,1]
    filters = np.transpose(k, (3, 0, 1, 2))  # (O, kh, kw, I)
    lo = filters.min(axis=(1, 2, 3), keepdims=True)
    hi = filters.max(axis=(1, 2, 3), keepdims=True)
    filters = (filters - lo) / np.maximum(hi - lo, 1e-8)
    if ci not in (1, 3):
        filters = filters.mean(axis=-1, keepdims=True)
        ci = 1
    cols = int(np.ceil(np.sqrt(co)))
    rows = int(np.ceil(co / cols))
    grid = np.ones((rows * (kh + 1) + 1, cols * (kw + 1) + 1,
                    3 if ci == 3 else 1), np.float32)
    for idx in range(co):
        r, c = divmod(idx, cols)
        grid[1 + r * (kh + 1): 1 + r * (kh + 1) + kh,
             1 + c * (kw + 1): 1 + c * (kw + 1) + kw] = filters[idx]
    img = (grid * 255).astype(np.uint8)
    if img.shape[-1] == 1:
        img = img[..., 0]
    im = Image.fromarray(img)
    s = args.scale
    im = im.resize((im.width * s, im.height * s), Image.NEAREST)
    im.save(args.out)
    print("saved", args.out)


if __name__ == "__main__":
    main()
