#!/usr/bin/env python
"""Inter-slice residual volumes (reference: tools/res_image_mask.py,
ConResNet-style input; unused by the live trainers): per volume, the
z-difference image res[z] = v[z] - v[z-1] (res[0]=0), saved next to the
originals."""

import argparse
import os

import numpy as np

from hebbax.data.nrrd_io import read_nrrd, write_nrrd


def residual(vol):
    res = np.zeros_like(vol, dtype=np.float32)
    res[..., 1:] = vol[..., 1:].astype(np.float32) - \
        vol[..., :-1].astype(np.float32)
    return res


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_path", required=True)
    parser.add_argument("--out_path", required=True)
    args = parser.parse_args(argv)
    os.makedirs(args.out_path, exist_ok=True)
    for name in os.listdir(args.image_path):
        vol, hdr = read_nrrd(os.path.join(args.image_path, name))
        write_nrrd(os.path.join(args.out_path, name), residual(vol),
                   affine=hdr["affine"])


if __name__ == "__main__":
    main()
