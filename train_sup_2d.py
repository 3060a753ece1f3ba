#!/usr/bin/env python
"""Entry point mirroring the reference's train_sup_2d.py CLI."""
from hebbax.cli.train_sup_2d import main

if __name__ == "__main__":
    main()
