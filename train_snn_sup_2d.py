#!/usr/bin/env python
"""Entry point mirroring the reference's train_snn_sup_2d.py: supervised
training of the spiking VGG9 (built directly, not via the registry in the
reference — train_snn_sup_2d.py:145-146; here it IS registered as
'snn_vgg' and rides the shared supervised harness)."""
from hebbax.cli.common import base_parser_2d
from hebbax.cli.train_sup_2d import add_args, build


def main(argv=None):
    parser = add_args(base_parser_2d({"network": "snn_vgg"}))
    args = parser.parse_args(argv)
    return build(args).run()


if __name__ == "__main__":
    main()
