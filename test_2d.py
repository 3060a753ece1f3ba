#!/usr/bin/env python
"""Entry point mirroring the reference's test_2d.py CLI."""
from hebbax.cli.test_2d import main

if __name__ == "__main__":
    main()
