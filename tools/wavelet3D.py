#!/usr/bin/env python
"""3D wavelet L/H volume generation (reference: tools/wavelet3D.py):
single-level 3D DWT; LLL band as L, sum of the 7 detail bands as H, both
linearly resampled back to the original volume size and saved as NRRD."""

import argparse
import os

import numpy as np

from hebbax.data.nrrd_io import read_nrrd, write_nrrd
from hebbax.models.common import resize_linear_align_corners
from hebbax.ops.wavelets import dwtn3


def _resize_to(arr, shape):
    import jax.numpy as jnp
    out = resize_linear_align_corners(
        jnp.asarray(arr, jnp.float32)[None, ..., None], shape)
    return np.asarray(out)[0, ..., 0]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_path", required=True)
    parser.add_argument("--L_path", required=True)
    parser.add_argument("--H_path", required=True)
    parser.add_argument("--wavelet_type", default="haar")
    args = parser.parse_args(argv)

    os.makedirs(args.L_path, exist_ok=True)
    os.makedirs(args.H_path, exist_ok=True)
    for name in os.listdir(args.image_path):
        vol, hdr = read_nrrd(os.path.join(args.image_path, name))
        bands = dwtn3(vol, args.wavelet_type)
        low = bands["aaa"]
        high = sum(v for k, v in bands.items() if k != "aaa")
        write_nrrd(os.path.join(args.L_path, name),
                   _resize_to(low, vol.shape).astype(np.float32),
                   affine=hdr["affine"])
        write_nrrd(os.path.join(args.H_path, name),
                   _resize_to(high, vol.shape).astype(np.float32),
                   affine=hdr["affine"])


if __name__ == "__main__":
    main()
