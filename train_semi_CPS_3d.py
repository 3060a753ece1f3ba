#!/usr/bin/env python
"""Entry point mirroring the reference's train_semi_CPS_3d.py."""
from hebbax.cli.train_semi_3d import main

if __name__ == "__main__":
    main("cps")
