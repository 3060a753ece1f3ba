#!/usr/bin/env python
"""Entry point mirroring the reference's train_semi_UAMT_2d.py."""
from hebbax.cli.train_semi_2d import main

if __name__ == "__main__":
    main("uamt")
