#!/usr/bin/env python
"""Generate wavelet L/H dataset variants from a folder of images
(reference: /root/reference/tools/wavelet2D.py): single-level DWT per
image; min-max-normalized LL saved to L/, min-max-normalized LH+HL+HH
merge saved to H/."""

import argparse
import os

import numpy as np
from PIL import Image

from hebbax.ops.wavelets import dwt2


def _norm255(x):
    rng = x.max() - x.min()
    if rng == 0:
        return np.zeros_like(x)
    return (x - x.min()) / rng * 255


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_path", required=True)
    parser.add_argument("--L_path", required=True)
    parser.add_argument("--H_path", required=True)
    parser.add_argument("--wavelet_type", default="db2",
                        help="haar, db2, db4, bior1.5, bior2.4, coif1")
    parser.add_argument("--if_RGB", default=False)
    args = parser.parse_args(argv)

    os.makedirs(args.L_path, exist_ok=True)
    os.makedirs(args.H_path, exist_ok=True)
    for name in os.listdir(args.image_path):
        img = Image.open(os.path.join(args.image_path, name))
        if args.if_RGB:
            img = img.convert("L")
        arr = np.array(img)
        ll, (lh, hl, hh) = dwt2(arr, args.wavelet_type)
        Image.fromarray(_norm255(ll).astype(np.uint8)).save(
            os.path.join(args.L_path, name))
        merge = _norm255(lh) + _norm255(hl) + _norm255(hh)
        Image.fromarray(_norm255(merge).astype(np.uint8)).save(
            os.path.join(args.H_path, name))


if __name__ == "__main__":
    main()
