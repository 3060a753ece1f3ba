#!/usr/bin/env python
"""3D prediction post-processing (reference: tools/Atrial/postprocess.py):
hole fill + keep largest connected component over a directory of NRRD
predictions."""

import argparse
import os

from hebbax.data.nrrd_io import read_nrrd, write_nrrd
from hebbax.ops.morphology import postprocess_3d_pred


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--pred_path", required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--fill_hole_thr", default=500, type=int)
    args = parser.parse_args(argv)

    os.makedirs(args.save_path, exist_ok=True)
    for name in os.listdir(args.pred_path):
        pred, hdr = read_nrrd(os.path.join(args.pred_path, name))
        out = postprocess_3d_pred(pred, args.fill_hole_thr)
        write_nrrd(os.path.join(args.save_path, name), out,
                   affine=hdr["affine"])


if __name__ == "__main__":
    main()
