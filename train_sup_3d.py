#!/usr/bin/env python
"""Entry point mirroring the reference's train_sup_3d.py CLI."""
from hebbax.cli.train_sup_3d import main

if __name__ == "__main__":
    main()
