#!/usr/bin/env python
"""Entry point mirroring the reference's pretrain_vae_unsup_3d.py."""
from hebbax.cli.pretrain_unsup_3d import main

if __name__ == "__main__":
    main("vae")
