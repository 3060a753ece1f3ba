#!/usr/bin/env python
"""Entry point mirroring the reference's test_3d.py CLI."""
from hebbax.cli.test_3d import main

if __name__ == "__main__":
    main()
