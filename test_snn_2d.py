#!/usr/bin/env python
"""Entry point mirroring the reference's test_snn_2d.py."""
import sys

from hebbax.cli.test_2d import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--network" not in argv and "-n" not in argv:
        argv += ["--network", "snn_vgg"]
    main(argv)
