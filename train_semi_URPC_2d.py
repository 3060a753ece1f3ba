#!/usr/bin/env python
"""Entry point mirroring the reference's train_semi_URPC_2d.py."""
from hebbax.cli.train_semi_2d import main

if __name__ == "__main__":
    main("urpc")
