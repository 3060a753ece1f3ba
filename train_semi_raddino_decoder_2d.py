#!/usr/bin/env python
"""Entry point mirroring the reference's train_semi_raddino_decoder_2d.py."""
from hebbax.cli.train_semi_raddino_decoder_2d import main

if __name__ == "__main__":
    main()
