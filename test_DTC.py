#!/usr/bin/env python
"""Entry point mirroring the reference's test_DTC.py — its only
distributed file (NCCL DistributedDataParallel inference over vnet_dtc,
test_DTC.py:51,91, legacy XNet code).  TPU-native equivalent: the
sliding-window tester with patch batches sharded over the device mesh
(--dp_devices 0 = all local devices)."""
import sys

from hebbax.cli.test_3d import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--network" not in argv and "-n" not in argv:
        argv += ["--network", "vnet_dtc"]
    if "--dp_devices" not in argv:
        argv += ["--dp_devices", "0"]
    main(argv)
