#!/usr/bin/env python
"""Entry point mirroring the reference's pretrain_superdiff3d_unsup_3d.py
(the reference script imports a module that does not exist,
pretrain_superdiff3d_unsup_3d.py:24; this delegates to the working
central-slice diffusion pretrainer, matching pretrain_superdiff_unsup_3d)."""
from hebbax.cli.pretrain_unsup_3d import main

if __name__ == "__main__":
    main("superdiff")
